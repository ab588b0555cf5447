"""P/J/A/O/F operator unit tests (SURVEY §5.2).

Adversarial cases: all-NULL join keys, unmatched left rows, empty inputs,
year-boundary ISO weeks, NULL label-encode input.
"""

import datetime

from m5_competition_kaggle_spark.functions.datetime import (
    dayofweek_pandas,
    is_weekend,
    weekofyear,
)
from m5_competition_kaggle_spark.functions.encode import label_encode
from m5_competition_kaggle_spark.operators.relational import (
    last_n_distinct_min,
    left_join,
    select_new_columns,
    union_all,
)


def test_left_join_null_keys_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "k int, lv string"
    )
    right = spark.createDataFrame([(1, "R1"), (None, "RN")], "k int, rv string")
    out = left_join(left, right, ["k"]).orderBy("lv").collect()
    assert [r["rv"] for r in out] == ["R1", None, None]
    # NULL keys never match (SQL semantics; pandas merge agrees for NaN)


def test_left_join_broadcast_hint_in_plan(spark):
    left = spark.createDataFrame([(i,) for i in range(100)], "k int")
    right = spark.createDataFrame([(1, "x")], "k int, v string")
    out = left_join(left, right, ["k"], broadcast_right=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_select_new_columns(spark):
    base = spark.createDataFrame([(1, 2.0)], "id int, v double")
    feat = spark.createDataFrame([(1, 2.0, 3.0, 4.0)], "id int, v double, f1 double, f2 double")
    out = select_new_columns(feat, base, ["id"])
    assert out.columns == ["id", "f1", "f2"]


def test_union_all_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "k int, s string")
    b = spark.createDataFrame([("y", 2)], "s string, k int")  # reordered cols
    out = union_all([a, b]).orderBy("k").collect()
    assert [(r["k"], r["s"]) for r in out] == [(1, "x"), (2, "y")]


def test_last_n_distinct_min(spark):
    dates = [datetime.date(2020, 1, d) for d in (1, 2, 3, 4, 5, 5, 5)]
    df = spark.createDataFrame([(d,) for d in dates], "dt date")
    got = last_n_distinct_min(df, "dt", 3).collect()[0][0]
    assert got == datetime.date(2020, 1, 3)  # 3rd-from-last distinct
    # n larger than distinct count → global min
    got = last_n_distinct_min(df, "dt", 99).collect()[0][0]
    assert got == datetime.date(2020, 1, 1)


def test_label_encode_lexicographic_and_null(spark):
    df = spark.createDataFrame(
        [("banana",), ("apple",), ("cherry",), ("apple",), (None,)],
        "fruit string",
    )
    out = label_encode(df, "fruit", "code")
    m = {r["fruit"]: r["code"] for r in out.collect()}
    assert m == {"apple": 0, "banana": 1, "cherry": 2, None: -1}


def test_label_encode_scalable_variant_matches(spark):
    """The distributed (zipWithIndex) ranking must produce identical codes
    to the window ranking — including on ties/duplicates and NULLs."""
    rows = [(f"v{i % 37:03d}",) for i in range(500)] + [(None,)] * 3
    df = spark.createDataFrame(rows, "k string")
    small = {
        (r["k"], r["code"])
        for r in label_encode(df, "k", "code", scalable=False).collect()
    }
    big = {
        (r["k"], r["code"])
        for r in label_encode(df, "k", "code", scalable=True).collect()
    }
    assert small == big


def test_dayofweek_pandas_convention(spark):
    # 2024-01-01 is a Monday; 2024-01-06 Saturday; 2024-01-07 Sunday.
    df = spark.createDataFrame(
        [(datetime.date(2024, 1, d),) for d in (1, 6, 7)], "dt date"
    )
    out = df.select(
        dayofweek_pandas("dt").alias("dow"), is_weekend("dt").alias("we")
    ).collect()
    assert [(r["dow"], r["we"]) for r in out] == [(0, 0), (5, 1), (6, 1)]


def test_weekofyear_year_boundary(spark):
    # ISO: 2021-01-01 is week 53 of 2020; 2025-12-29 is week 1 of 2026.
    df = spark.createDataFrame(
        [(datetime.date(2021, 1, 1),), (datetime.date(2025, 12, 29),)], "dt date"
    )
    out = [r[0] for r in df.select(weekofyear("dt")).collect()]
    assert out == [53, 1]


def test_empty_input_flows(spark):
    empty = spark.createDataFrame([], "k int, v double")
    assert left_join(empty, empty, ["k"]).count() == 0
    assert union_all([empty, empty]).count() == 0
    assert label_encode(empty, "v", "c").count() == 0
    assert last_n_distinct_min(empty, "k", 5).collect()[0][0] is None
