"""100× REPLICATED-FACTS probe for the TPC-H-fact queries
(orders + lineitem grow 100×, dims stay 1× — the classic star-schema
growth shape; same orderkey-shift construction as probe_10x.py so
referential joins hold, at 100 replicas: 60M lineitem rows).

Usage: python scripts/probe_facts_100x.py x172_sales_gini x196_discount_lift ...
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
X100_DIR = "/tmp/sparkgraft_facts_x100"
REPLICAS = 100


def build_x100(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(X100_DIR, "_DONE")):
        return
    shutil.rmtree(X100_DIR, ignore_errors=True)
    os.makedirs(X100_DIR)
    ords = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    mk = ords.agg(F.max("o_orderkey")).collect()[0][0] + 1
    reps = spark.range(REPLICAS).select(
        F.col("id").cast("long").alias("__rep")
    )
    # orderkeys shift past the original range per replica; customer/
    # part/supplier keys stay (100× facts per dimension row — the
    # star-schema shape where facts outgrow dims)
    (
        ords.crossJoin(F.broadcast(reps))
        .withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("__rep") * mk
        )
        .drop("__rep")
        .repartition(32)
        .write.parquet(f"{X100_DIR}/orders.parquet")
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        li.crossJoin(F.broadcast(reps))
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("__rep") * mk
        )
        .drop("__rep")
        .repartition(32)
        .write.parquet(f"{X100_DIR}/lineitem.parquet")
    )
    for t in ("documents", "embeddings", "events", "region", "nation",
              "customer", "supplier", "part"):
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
            "usage: probe_facts_100x.py <query> [query ...]"
        )
    spark = get_spark("probe_facts100x")
    qs = entry_mod.queries()
    # staged-but-unregistered queue modules probe too
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
