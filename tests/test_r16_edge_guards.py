"""Degenerate-input guards for the r16 staged operators: empty or
sub-minimal inputs must yield well-formed empty/NULL results, never
throw — plus a brute-force reference for the transition kernel."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.streaming.transition_state import (
    _pairs_from_frame,
    batch_transitions,
)

EV_SCHEMA = (
    "user_id long, tsn long, event_id long, event_type string"
)


def test_batch_transitions_empty(spark):
    empty = spark.createDataFrame([], EV_SCHEMA)
    assert batch_transitions(empty).count() == 0


def test_batch_transitions_single_event_users_drop(spark):
    df = spark.createDataFrame(
        [(1, 10, 1, "a"), (2, 20, 2, "b"), (2, 30, 3, "c")],
        EV_SCHEMA,
    )
    rows = batch_transitions(df).collect()
    assert [(r["user_id"], r["a"], r["b"]) for r in rows] == [
        (2, "b", "c")
    ]


def test_pairs_kernel_carries_state_seed(spark):
    """The GroupState seed produces the straddling pair exactly once:
    batch 2's first event pairs with batch 1's last."""
    b1 = pd.DataFrame(
        {"tsn": [100, 200], "event_id": [1, 2],
         "event_type": ["a", "b"]}
    )
    p1, last_tsn, last_type = _pairs_from_frame(b1, None)
    assert list(zip(p1["a"], p1["b"])) == [("a", "b")]
    assert (last_tsn, last_type) == (200, "b")
    b2 = pd.DataFrame(
        {"tsn": [300], "event_id": [3], "event_type": ["c"]}
    )
    p2, last_tsn2, last_type2 = _pairs_from_frame(b2, last_type)
    assert list(zip(p2["a"], p2["b"])) == [("b", "c")]
    assert (last_tsn2, last_type2) == (300, "c")


def test_pairs_kernel_sorts_within_batch(spark):
    """Out-of-order rows WITHIN a batch are sorted by (tsn,
    event_id) before pairing — only cross-batch order is the
    caller's contract."""
    b = pd.DataFrame(
        {"tsn": [300, 100, 200], "event_id": [3, 1, 2],
         "event_type": ["c", "a", "b"]}
    )
    p, _, last_type = _pairs_from_frame(b, None)
    assert list(zip(p["a"], p["b"])) == [("a", "b"), ("b", "c")]
    assert last_type == "c"


def test_runs_all_equal_series_emits_nothing(spark):
    """A flat series has zero nonzero moves: the type drops from the
    runs table rather than emitting a degenerate row."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [("k", t, 5) for t in range(6)],
        "event_type string, t long, y long",
    )
    w = Window.partitionBy("event_type").orderBy("t")
    moves = (
        df.withColumn("diff", F.col("y") - F.lag("y").over(w))
        .filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
    )
    assert moves.count() == 0


def test_conversion_lag_no_viewers_yields_nulls(spark):
    """The x183 aggregate over zero qualifying users must produce the
    guarded NULLs, not a division error (ANSI DIV-by-zero throws)."""
    df = spark.createDataFrame([], "v0 long, p0 long")
    lagged = df.select(
        "v0",
        "p0",
        F.expr(
            "CASE WHEN v0 IS NOT NULL AND p0 IS NOT NULL"
            " AND p0 >= v0 THEN (p0 - v0) DIV 60000000000 END"
        ).alias("lag_min"),
    )
    r = lagged.agg(
        F.sum(F.when(F.col("v0").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_viewers"),
        F.sum(F.when(F.col("lag_min").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_converted"),
        F.sum("lag_min").alias("sum_lag_min"),
    ).select(
        F.expr(
            "CASE WHEN n_viewers > 0 THEN"
            " (1000000 * n_converted) DIV n_viewers END"
        ).alias("conversion_ppm"),
        F.expr(
            "CASE WHEN n_converted > 0 THEN"
            " sum_lag_min DIV n_converted END"
        ).alias("mean_lag_min"),
    ).collect()[0]
    assert r["conversion_ppm"] is None
    assert r["mean_lag_min"] is None
