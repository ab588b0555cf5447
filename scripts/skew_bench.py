"""Skew micro-benchmark: salted operators vs plain plans vs AQE.

Reproduces the round-6 one-off (BASELINE.md "Round-6 skew
micro-benchmarks") and adds the AQE-on comparison the r6 verdict asked
for (item 6): production Spark 3.x/4.x ships OptimizeSkewedJoin, so the
operative question is when `salted_left_join` still beats letting AQE
split the skewed partitions at runtime.

Synthetic workload (same as r6): 8M-row left, 50% of rows on ONE hot
key, the rest uniform over 100k cold keys; 100k-row right. Broadcast is
disabled on BOTH the static and adaptive paths — with a broadcastable
right side there is no shuffle skew to rescue and neither technique is
relevant. AQE's skew thresholds default to 256 MB partitions; this
synthetic's hot partition is ~10s of MB, so the thresholds are scaled
down proportionally (8 MB / 4 MB advisory) — the point is to let AQE
do at local scale exactly what it would do to a 100×-bigger partition
at cluster scale.

Usage: python scripts/skew_bench.py [reps]
Prints one result line per (experiment, variant), best-of-N wall time.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from m5_competition_kaggle_spark.operators.skew import (  # noqa: E402
    salted_aggregate,
    salted_left_join,
)

N_LEFT = 8_000_000
N_COLD_KEYS = 100_000
SALT = 32


def build(spark):
    left = (
        spark.range(N_LEFT)
        .select(
            F.when(
                F.col("id") % 2 == 0, F.lit(0)
            ).otherwise(
                F.pmod(F.xxhash64("id"), F.lit(N_COLD_KEYS))
            ).alias("k"),
            (F.col("id") % 1000).alias("v"),
        )
        .persist()
    )
    right = (
        spark.range(N_COLD_KEYS)
        .select(F.col("id").alias("k"), (F.col("id") * 7).alias("payload"))
        .persist()
    )
    left.count(), right.count()
    return left, right


def timed(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def set_aqe(spark, on: bool):
    c = spark.conf
    c.set("spark.sql.adaptive.enabled", str(on).lower())
    c.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())
    # scale the skew thresholds to this synthetic's partition sizes
    c.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "2m",
    )
    c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    # broadcast stays off on both paths: with a broadcastable right
    # side there is no shuffle skew problem to begin with
    c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("skew-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    left, right = build(spark)
    results = {}

    # --- aggregation (AQE irrelevant: partial agg is the rescue) ----
    set_aqe(spark, False)
    results["agg_plain_aqe_off"] = timed(
        lambda: left.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("c")
        ).count(),
        reps,
    )
    results["agg_salted_aqe_off"] = timed(
        lambda: salted_aggregate(left, ["k"], "v", SALT).count(), reps
    )

    for aqe in (False, True):
        set_aqe(spark, aqe)
        tag = "aqe_on" if aqe else "aqe_off"
        results[f"join_plain_{tag}"] = timed(
            lambda: left.join(right, "k", "left").count(), reps
        )
        results[f"join_salted_{tag}"] = timed(
            lambda: salted_left_join(
                left, right, ["k"], SALT, spread_cols=["v"]
            ).count(),
            reps,
        )

    for k, v in results.items():
        print(f"{k:24s} {v:6.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
