"""Bucket-expanded interval join (operators/interval.py)."""

import random

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.interval import interval_join


def _run(spark, points, intervals, g):
    p = spark.createDataFrame(points, "pid long, t long")
    i = spark.createDataFrame(intervals, "iid long, s long, e long")
    rows = interval_join(p, i, "t", "s", "e", g).collect()
    return {(r.pid, r.iid) for r in rows}


def _brute(points, intervals):
    return {(pid, iid)
            for pid, t in points
            for iid, s, e in intervals
            if s <= t < e}


def test_matches_brute_force_random(spark):
    """Random points/intervals across several bucket widths — including
    widths much smaller and much larger than the intervals — must all
    reproduce the brute-force pair set exactly (and prove the
    exactly-once emission: a set comparison would hide misses but the
    collected list length catches duplicates)."""
    rng = random.Random(5)
    points = [(i, rng.randrange(0, 1000)) for i in range(120)]
    intervals = [
        (j, s, s + rng.randrange(1, 120))
        for j, s in ((j, rng.randrange(0, 950)) for j in range(40))
    ]
    expect = _brute(points, intervals)
    for g in (7, 50, 64, 500, 10_000):
        got = _run(spark, points, intervals, g)
        assert got == expect, f"bucket width {g}"


def test_no_duplicate_emission(spark):
    """An interval spanning many buckets still matches each point once."""
    points = [(1, 55)]
    intervals = [(9, 0, 1000)]  # spans 100 buckets at g=10
    p = spark.createDataFrame(points, "pid long, t long")
    i = spark.createDataFrame(intervals, "iid long, s long, e long")
    rows = interval_join(p, i, "t", "s", "e", 10).collect()
    assert len(rows) == 1


def test_half_open_boundaries(spark):
    points = [(1, 10), (2, 19), (3, 20), (4, 9)]
    intervals = [(7, 10, 20)]
    assert _run(spark, points, intervals, 5) == {(1, 7), (2, 7)}


def test_negative_and_unaligned_values(spark):
    """floor() bucketing (not int division) keeps negatives correct."""
    points = [(1, -15), (2, -1), (3, 0)]
    intervals = [(7, -20, 0)]
    assert _run(spark, points, intervals, 8) == {(1, 7), (2, 7)}


def test_empty_sides(spark):
    p = spark.createDataFrame([], "pid long, t long")
    i = spark.createDataFrame([(1, 0, 10)], "iid long, s long, e long")
    assert interval_join(p, i, "t", "s", "e", 5).count() == 0
    p2 = spark.createDataFrame([(1, 3)], "pid long, t long")
    i2 = spark.createDataFrame([], "iid long, s long, e long")
    assert interval_join(p2, i2, "t", "s", "e", 5).count() == 0


def test_plan_is_equi_join_not_nested_loop(spark):
    """The whole point: the range predicate must ride an equi-join on
    the bucket key, never a BroadcastNestedLoopJoin / cartesian."""
    p = spark.range(1000).select(
        F.col("id").alias("pid"), (F.col("id") * 13 % 997).alias("t"))
    i = spark.range(200).select(
        F.col("id").alias("iid"), (F.col("id") * 5).alias("s"),
        (F.col("id") * 5 + 40).alias("e"))
    plan = interval_join(p, i, "t", "s", "e", 32)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
