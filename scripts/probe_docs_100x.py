"""100× REPLICA-SALTED document-corpus probe for the dedup/curation
family.

The standard 10× probe clone-replicates documents, which makes every
pair/clique output grow quadratically-to-cubically in clone count —
honest for throughput but it entangles "more data" with "more
duplication". This probe scales the corpus the way a real crawl grows:
each replica's text gets a per-replica salt token appended, so
- near-dup structure WITHIN a replica is preserved exactly (the salt
  shifts every shingle set identically), and
- NO new cross-replica near-dups are created (3-shingles containing
  the salt differ per replica; jaccard across replicas drops below
  any 0.8-style threshold),
meaning output cardinality for dedup pairs/clusters grows ~linearly
(~100×) and wall-clock ratios read directly as scan/shuffle scaling.

Usage: python scripts/probe_docs_100x.py x1_dedup_exact x29_corpus_to_shards ...
Prints BASELINE.md-ready rows: | query | 1× s | 100× s | ratio |.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = "/root/testdata/sf0.1"
X100_DIR = "/tmp/sparkgraft_docs_x100"
REPLICAS = 100


def build_x100(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(X100_DIR, "_DONE")):
        return
    shutil.rmtree(X100_DIR, ignore_errors=True)
    os.makedirs(X100_DIR)
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # max(doc_id)+1 stride, not count(): collision-free even if a
    # regenerated corpus has id gaps (r12 ADVICE; matches
    # probe_facts_100x.py).
    n = src.agg(F.max("doc_id")).collect()[0][0] + 1
    # One generated column replaces a 100-way union: cross the corpus
    # with a replica index (broadcast 100-row side), salt text + id.
    reps = spark.range(REPLICAS).select(
        F.col("id").cast("long").alias("__rep")
    )
    big = (
        src.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * n)
        .withColumn(
            "text",
            F.concat(
                F.col("text"), F.lit(" replicasalt"),
                F.col("__rep").cast("string"),
            ),
        )
        .withColumn(
            "n_chars", F.length("text").cast("long")
        )
        .drop("__rep")
    )
    big.repartition(32).write.parquet(f"{X100_DIR}/documents.parquet")
    # the curation queries also read embeddings/events alongside docs
    for t in ("embeddings", "events", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem"):
        shutil.copy(
            f"{SF_DIR}/{t}.parquet", f"{X100_DIR}/{t}.parquet"
        )
    open(os.path.join(X100_DIR, "_DONE"), "w").close()


def time_query(spark, fn, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    import __spark_entry__ as entry_mod
    from m5_competition_kaggle_spark.session import get_spark

    names = sys.argv[1:]
    if not names:  # a raise, not assert: python -O strips asserts
        raise SystemExit(
            "usage: probe_docs_100x.py <query> [query ...]"
        )
    spark = get_spark("probe100x")
    qs = entry_mod.queries()
    # staged-but-unregistered queue modules probe too (the 10x
    # probe's convention)
    from m5_competition_kaggle_spark.queries import (
        extensions_r12 as _st12,
        extensions_r13 as _st13,
        extensions_r14 as _st14,
        extensions_r15 as _st15,
        extensions_r16 as _st16,
        extensions_r17 as _st17,
        extensions_r18 as _st18,
        extensions_r19 as _st19,
        extensions_r20 as _st20,
    )

    _staged_qs = {**_st12.QUERIES, **_st13.QUERIES,
                  **_st14.QUERIES, **_st15.QUERIES,
                  **_st16.QUERIES, **_st17.QUERIES,
                  **_st18.QUERIES, **_st19.QUERIES,
                  **_st20.QUERIES}
    for k, v in _staged_qs.items():
        qs.setdefault(k, v)
    build_x100(spark)
    for name in names:
        base = time_query(spark, qs[name], SF_DIR)
        hundred = time_query(spark, qs[name], X100_DIR)
        ratio = hundred / base if base > 0 else float("nan")
        print(
            f"| {name} | {base:.1f} | {hundred:.1f} | {ratio:.1f}x |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
