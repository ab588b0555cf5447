"""Gap-fill + LOCF operator semantics (operators/timeseries.py).

Adversarial cases: leading NULLs (nothing to carry), single-day keys
(no expansion), multi-day gaps (one fill row per missing day), NULL
observations inside the span (carried over, not reset), and key
isolation (no carry across keys).
"""

import datetime

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.timeseries import (
    gap_fill_days,
    locf,
)


def d(day):
    return datetime.date(2024, 1, day)


def make(spark, rows):
    return spark.createDataFrame(rows, "k string, day date, v double")


def test_gap_fill_densifies_per_key_span(spark):
    df = make(
        spark,
        [("a", d(1), 1.0), ("a", d(4), 4.0), ("b", d(2), 2.0)],
    )
    out = gap_fill_days(df, ["k"], "day").orderBy("k", "day").collect()
    got = [(r.k, r.day.day, r.v) for r in out]
    # a: 4 consecutive days with NULLs in the 2-day gap; b: single day,
    # no expansion beyond its own span.
    assert got == [
        ("a", 1, 1.0),
        ("a", 2, None),
        ("a", 3, None),
        ("a", 4, 4.0),
        ("b", 2, 2.0),
    ]


def test_locf_carries_forward_within_key_only(spark):
    df = make(
        spark,
        [
            ("a", d(1), None),  # leading NULL: stays NULL
            ("a", d(2), 2.0),
            ("a", d(3), None),  # carried 2.0
            ("a", d(4), None),  # still 2.0 (multi-row gap)
            ("a", d(5), 5.0),
            ("b", d(1), None),  # no spill from key a
        ],
    )
    out = locf(df, ["k"], "day", "v", "ff")
    got = {(r.k, r.day.day): r.ff for r in out.collect()}
    assert got == {
        ("a", 1): None,
        ("a", 2): 2.0,
        ("a", 3): 2.0,
        ("a", 4): 2.0,
        ("a", 5): 5.0,
        ("b", 1): None,
    }


def test_gap_fill_then_locf_composition(spark):
    df = make(spark, [("a", d(1), 1.0), ("a", d(4), 4.0)])
    out = locf(gap_fill_days(df, ["k"], "day"), ["k"], "day", "v", "ff")
    got = {r.day.day: (r.ff, r.v is None) for r in out.collect()}
    assert got == {
        1: (1.0, False),
        2: (1.0, True),
        3: (1.0, True),
        4: (4.0, False),
    }
