"""W1–W3 unit + property tests (SURVEY §5.2, §5.4).

Adversarial cases: groups shorter than the window width (min_periods),
single-row groups, NULL values inside the frame, lag∘lead inversion.
"""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.window import (
    series_window,
    trailing_mean_col,
    with_lags,
    with_lead,
    with_trailing_means,
)


def make_series(spark, rows):
    return spark.createDataFrame(rows, "id string, d int, v double")


@pytest.fixture(scope="module")
def df(spark):
    rows = [("a", i, float(i)) for i in range(1, 11)]  # 10-row group
    rows += [("b", i, 10.0 * i) for i in range(1, 4)]  # 3-row group < window
    rows += [("c", 1, 5.0)]  # single-row group
    return make_series(spark, rows)


def collect_map(df, key_cols, val_col):
    return {
        tuple(r[k] for k in key_cols): r[val_col] for r in df.collect()
    }


def test_lag_basic_and_group_isolation(df):
    out = with_lags(df, "v", [1, 2], ["id"], ["d"], "{col}_lag_{k}")
    m = collect_map(out, ["id", "d"], "v_lag_1")
    assert m[("a", 1)] is None  # no spill from previous group
    assert m[("a", 5)] == 4.0
    assert m[("b", 1)] is None and m[("b", 2)] == 10.0
    assert m[("c", 1)] is None
    m2 = collect_map(out, ["id", "d"], "v_lag_2")
    assert m2[("a", 2)] is None and m2[("a", 3)] == 1.0


def test_trailing_mean_min_periods(df):
    out = with_trailing_means(df, "v", [3], ["id"], ["d"], "roll_{k}")
    m = collect_map(out, ["id", "d"], "roll_3")
    # pandas x.shift(1).rolling(3).mean(): NULL until 3 prior rows exist
    assert m[("a", 1)] is None and m[("a", 2)] is None and m[("a", 3)] is None
    assert m[("a", 4)] == pytest.approx((1 + 2 + 3) / 3)
    assert m[("a", 10)] == pytest.approx((7 + 8 + 9) / 3)
    # group shorter than window: never fills
    assert m[("b", 3)] is None
    assert m[("c", 1)] is None


def test_trailing_mean_relaxed_min_periods(spark, df):
    w = series_window(["id"], ["d"])
    out = df.withColumn("r", trailing_mean_col("v", 3, w, min_periods=1))
    m = collect_map(out, ["id", "d"], "r")
    assert m[("a", 1)] is None  # still nothing before first row
    assert m[("a", 2)] == pytest.approx(1.0)
    assert m[("b", 3)] == pytest.approx((10.0 + 20.0) / 2)


def test_trailing_mean_nulls_in_frame(spark):
    # NULL values: count(col) ignores NULLs, so a frame containing a NULL
    # does not reach min_periods — matches pandas (NaN in window → NaN mean
    # only when min_periods unmet; pandas mean skips NaN but counts only
    # non-NaN toward min_periods).
    rows = [("a", 1, 1.0), ("a", 2, None), ("a", 3, 3.0), ("a", 4, 4.0), ("a", 5, 5.0)]
    df = spark.createDataFrame(rows, "id string, d int, v double")
    w = series_window(["id"], ["d"])
    out = df.withColumn("r", trailing_mean_col("v", 3, w))
    m = collect_map(out, ["id", "d"], "r")
    assert m[("a", 4)] is None  # frame {1,NULL,3}: only 2 non-null
    assert m[("a", 5)] is None  # frame {NULL,3,4}: only 2 non-null


def test_lead_then_lag_inversion(spark):
    rows = [("g", i, float(i * i)) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "id string, d int, v double")
    out = with_lead(df, ["v"], 7, ["id"], ["d"], "lead_{col}")
    out = with_lags(out, "lead_v", [7], ["id"], ["d"], "{col}_lag_{k}")
    bad = out.filter(
        F.col("lead_v_lag_7").isNotNull() & (F.col("lead_v_lag_7") != F.col("v"))
    ).count()
    assert bad == 0
    # and lead is defined exactly on the first n-7 rows
    assert out.filter(F.col("lead_v").isNotNull()).count() == 29 - 7


def test_single_shuffle_for_stacked_windows(df):
    out = with_lags(df, "v", [1, 2, 7], ["id"], ["d"], "{col}_lag_{k}")
    out = with_trailing_means(out, "v", [3, 7], ["id"], ["d"], "roll_{k}")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
