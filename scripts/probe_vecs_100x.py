"""100× PERTURBED-REPLICA embedding probe for the bucketed ANN family
(IVF / PQ / LSH / radius).

Clone-replicating embeddings would give every vector 99 exact
duplicates — an adversarial neighbor structure that inflates candidate
lists ~100× and measures a different (denser) workload. Instead each
replica adds a small deterministic offset to the first coordinate
(rep · 0.003, well past float32 epsilon at unit scale but tiny against
the data spread), so replicas form distinct nearby points: corpus
density grows smoothly, cluster/bucket geometry is preserved, and no
artificial exact-dup cliques appear. vec_ids shift past the original
range; labels copy through.

Usage: python scripts/probe_vecs_100x.py x23_sim_topk_ivf x72_sim_topk_pq ...
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
X100_DIR = "/tmp/sparkgraft_vecs_x100"
REPLICAS = 100


def build_x100(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(X100_DIR, "_DONE")):
        return
    shutil.rmtree(X100_DIR, ignore_errors=True)
    os.makedirs(X100_DIR)
    src = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # max(vec_id)+1 stride, not count(): collision-free even if a
    # regenerated corpus has id gaps (r12 ADVICE; matches
    # probe_facts_100x.py).
    n = src.agg(F.max("vec_id")).collect()[0][0] + 1
    reps = spark.range(REPLICAS).select(
        F.col("id").cast("long").alias("__rep")
    )
    big = (
        src.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * n)
        .withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (v, i) -> CASE WHEN i = 0 "
                "THEN CAST(v + __rep * 0.003 AS FLOAT) "
                "ELSE v END)"
            ),
        )
        .drop("__rep")
    )
    big.repartition(32).write.parquet(f"{X100_DIR}/embeddings.parquet")
    for t in ("documents", "events", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{X100_DIR}/{t}.parquet")
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
            "usage: probe_vecs_100x.py <query> [query ...]"
        )
    spark = get_spark("probe_vecs100x")
    qs = entry_mod.queries()
    # staged-but-unregistered queue modules probe too (the 10x
    # probe's convention)
    from m5_competition_kaggle_spark.queries import (
        extensions_r13 as _st13,
        extensions_r14 as _st14,
        extensions_r15 as _st15,
        extensions_r16 as _st16,
        extensions_r17 as _st17,
        extensions_r18 as _st18,
        extensions_r19 as _st19,
        extensions_r20 as _st20,
    )

    _staged_qs = {**_st13.QUERIES, **_st14.QUERIES,
                  **_st15.QUERIES, **_st16.QUERIES,
                  **_st17.QUERIES, **_st18.QUERIES,
                  **_st19.QUERIES, **_st20.QUERIES}
    for k, v in _staged_qs.items():
        qs.setdefault(k, v)
    build_x100(spark)
    for name in names:
        base = time_query(spark, qs[name], SF_DIR)
        big = time_query(spark, qs[name], X100_DIR)
        print(
            f"| {name} | {base:.1f} | {big:.1f} "
            f"| {big / base:.1f}x |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
