"""100× TIME-SHIFTED event-stream probe for the monitor / forecast /
interval family.

The 10× probe (scripts/probe_10x.py) already shifts event replicas a
month apart so density stays constant; this probe extends the same
construction to 100 replicas (10M events across an ~8.5-year span) —
the shape a year-scale telemetry corpus actually has: more DAYS at
constant daily density, the same key cardinalities. Monitor-family
state (day × key cells) therefore grows ~100× linearly, and wall
ratios read directly as scan + keyed-aggregate scaling; any operator
whose cost grows faster than its cell count is exposed.

Usage: python scripts/probe_events_100x.py x144_day_auc s23_stream_changepoint ...
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
X100_DIR = "/tmp/sparkgraft_events_x100"
# --users variant: replicas also shift user_id, so the corpus grows by
# ADDING USERS at constant per-user density — the shape a real
# telemetry corpus grows in. The default (same users, longer
# timelines) stresses per-user accumulation instead; the pair
# distinguishes "more history per user" from "more users".
X100U_DIR = "/tmp/sparkgraft_events_x100_users"
# --dense variant: NO time shift — 100× events stacked into the SAME
# ~30-day span (same calendar, 100× traffic: the dimension volume
# actually grows at fixed span). Day-cell state stays |days|×|keys|;
# per-cell µ-sums grow 100×, stressing the documented µ-scale
# contracts the span-grown variant cannot reach.
X100D_DIR = "/tmp/sparkgraft_events_x100_dense"
REPLICAS = 100


def build_x100(spark, out_dir: str = X100_DIR,
               shift_users: bool = False,
               shift_time: bool = True) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # Per-replica id stride = max(event_id)+1, NOT count(): the count
    # convention is collision-free only while event_ids are contiguous
    # 0-based — a regenerated corpus with id gaps would silently
    # produce duplicate shifted ids (r12 ADVICE; matches
    # probe_facts_100x.py's max(key)+1 convention).
    n = src.agg(F.max("event_id")).collect()[0][0] + 1
    max_user = src.agg(F.max("user_id")).collect()[0][0] + 1
    # One generated column replaces a 100-way union: cross with a
    # replica index (broadcast side), shift ids past the original
    # range and timestamps 31 days per replica (the original span is
    # ~30 days, so replicas never overlap — constant daily density).
    reps = spark.range(REPLICAS).select(
        F.col("id").cast("long").alias("__rep")
    )
    big = (
        src.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * n)
        # no ts_nanos column here: the raw parquet carries only ts, and
        # sources/catalog.load_table derives ts_nanos from it uniformly
    )
    if shift_time:
        big = big.withColumn(
            "ts",
            F.expr("ts + make_interval(0, 0, 0, __rep * 31, 0, 0, 0)"),
        )
    else:
        # dense mode: replicas land in the same span; offset each by
        # __rep microseconds so (ts, event_id) orderings stay unique
        big = big.withColumn(
            "ts", F.expr("ts + make_interval(0,0,0,0,0,0, __rep/1e6)")
        )
    if shift_users:
        big = big.withColumn(
            "user_id", F.col("user_id") + F.col("__rep") * max_user
        )
    big = big.drop("__rep")
    big.repartition(32).write.parquet(f"{out_dir}/events.parquet")
    for t in ("documents", "embeddings", "region", "nation",
              "customer", "supplier", "part", "orders", "lineitem"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out_dir}/{t}.parquet")
    open(os.path.join(out_dir, "_DONE"), "w").close()


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
    users_mode = "--users" in names
    dense_mode = "--dense" in names
    names = [n for n in names if n not in ("--users", "--dense")]
    if not names:  # a raise, not assert: python -O strips asserts
        raise SystemExit(
            "usage: probe_events_100x.py [--users] <query> [query ...]"
        )
    spark = get_spark("probe_events100x")
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
    big_dir = (X100D_DIR if dense_mode
               else X100U_DIR if users_mode else X100_DIR)
    build_x100(spark, big_dir, shift_users=users_mode,
               shift_time=not dense_mode)
    for name in names:
        base = time_query(spark, qs[name], SF_DIR)
        big = time_query(spark, qs[name], big_dir)
        print(
            f"| {name} | {base:.1f} | {big:.1f} "
            f"| {big / base:.1f}x |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
