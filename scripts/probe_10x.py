"""10× scaling probe: replicate sf0.1 tables 10× into /tmp and time
named queries cold at both scales.

Replication preserves the workload's *structure* (near-dup groups,
source mix, event-type mix) while growing row counts 10×: documents
replicate with shifted doc_ids (replica texts are exact dups of the
original — adversarial for dedup operators, which is the point),
events with shifted event_ids and timestamps displaced by one day per
replica (so interval/window densities stay constant instead of
stacking 10 replicas into the same hour).

Usage: python scripts/probe_10x.py x63_bm25_topk x67_interval_join ...
Each query is timed cold (fresh session cache) best-of-2 at sf0.1 and
at the replicated 10× directory; results print as a markdown row ready
for BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
# v2: lineitem + orders now replicate too (r6 catch: the basket/join
# probes were silently rerunning 1x TPC-H facts)
X10_DIR = "/tmp/sparkgraft_sf0.1_x10_v2"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
DAY_NS = 86_400_000_000_000


def build_x10(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(X10_DIR, "_DONE")):
        return
    shutil.rmtree(X10_DIR, ignore_errors=True)
    os.makedirs(X10_DIR)
    for t in TABLES:
        src = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            n = src.count()
            parts = [
                src.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(r * n))
                for r in range(10)
            ]
        elif t == "events":
            # Replicas shift past the original ~30-day span so event
            # DENSITY stays constant (stacking replicas into the same
            # hours would grow interval-join work quadratically — a
            # different, denser workload, probed separately).
            n = src.count()
            parts = [
                src.withColumn("event_id", F.col("event_id") + F.lit(r * n))
                .withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {r * 31} DAYS"))
                for r in range(10)
            ]
        elif t == "embeddings":
            n = src.count()
            parts = [
                src.withColumn("vec_id", F.col("vec_id") + F.lit(r * n))
                for r in range(10)
            ]
        elif t == "orders":
            # shift order keys past the original range so replicas are
            # new orders; customer keys stay (10x orders per customer)
            mk = src.agg(F.max("o_orderkey")).collect()[0][0] + 1
            parts = [
                src.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(r * mk))
                for r in range(10)
            ]
        elif t == "lineitem":
            # the SAME key shift as orders, so referential joins hold
            ords = spark.read.parquet(f"{SF_DIR}/orders.parquet")
            mk = ords.agg(F.max("o_orderkey")).collect()[0][0] + 1
            parts = [
                src.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(r * mk))
                for r in range(10)
            ]
        else:  # dims the probes don't grow — copy as-is
            parts = [src]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(f"{X10_DIR}/{t}.parquet")
    open(os.path.join(X10_DIR, "_DONE"), "w").write("ok")


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
        raise SystemExit("usage: probe_10x.py <query> [query ...]")
    spark = get_spark("probe10x")
    qs = entry_mod.queries()
    # staged-but-unregistered queue modules probe too (they need their
    # BASELINE.md scale rows ready before their registration round)
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
    build_x10(spark)
    for name in names:
        base = time_query(spark, qs[name], SF_DIR)
        ten = time_query(spark, qs[name], X10_DIR)
        ratio = ten / base if base > 0 else float("nan")
        print(f"| {name} | {base:.1f} | {ten:.1f} | {ratio:.1f}x |",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
