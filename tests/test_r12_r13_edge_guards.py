"""Degenerate-input guards for the r12/r13 staged operators (the
test_r8_edge_guards pattern): empty or sub-minimal inputs must yield
well-formed empty/NULL results, never throw — these paths run in
production whenever a filter leaves nothing behind."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def _cells(spark, rows):
    return spark.createDataFrame(
        rows, "day date, key string, n bigint, y_sum bigint"
    )


def test_trend_assemblies_on_empty_cells(spark):
    from m5_competition_kaggle_spark.streaming.trend_monitor import (
        changepoint_from_cells,
        mase_from_cells,
        theil_sen_from_cells,
    )

    empty = _cells(spark, [])
    assert changepoint_from_cells(empty).count() == 0
    assert theil_sen_from_cells(empty).count() == 0
    assert mase_from_cells(empty).count() == 0


def test_trend_assemblies_on_single_day(spark):
    """One day per key: no interior split, no pairs, no lag-7 pair —
    every assembly yields zero rows (n < 2 contracts), not an error."""
    from m5_competition_kaggle_spark.streaming.trend_monitor import (
        changepoint_from_cells,
        mase_from_cells,
        theil_sen_from_cells,
    )

    one = _cells(
        spark, [(datetime.date(2024, 1, 1), "k", 3, 300)]
    )
    assert changepoint_from_cells(one).count() == 0
    assert theil_sen_from_cells(one).count() == 0
    assert mase_from_cells(one).count() == 0


def test_mase_under_eight_days_has_no_pairs(spark):
    from m5_competition_kaggle_spark.streaming.trend_monitor import (
        mase_from_cells,
    )

    d0 = datetime.date(2024, 1, 1)
    seven = _cells(
        spark,
        [(d0 + datetime.timedelta(days=t), "k", 1, 10 * t)
         for t in range(7)],
    )
    assert mase_from_cells(seven).count() == 0


def test_mase_null_guard_when_train_flat(spark):
    """A perfectly weekly series has ZERO in-sample seasonal-naive
    error — the denominator guard must yield NULL mase, not a
    div-by-zero."""
    from m5_competition_kaggle_spark.streaming.trend_monitor import (
        mase_from_cells,
    )

    d0 = datetime.date(2024, 1, 1)
    cells = _cells(
        spark,
        [(d0 + datetime.timedelta(days=t), "k", 1,
          100 * (t % 7))
         for t in range(20)],
    )
    rows = mase_from_cells(cells).collect()
    assert len(rows) == 1
    assert rows[0]["san_train"] == 0
    assert rows[0]["mase_ppm"] is None


def test_list_growth_empty_new_corpus(spark):
    from m5_competition_kaggle_spark.operators.ivf_maintain import (
        list_growth,
    )

    cents = spark.createDataFrame(
        [(0, [0]), (1, [1000])], "cid long, cv array<bigint>"
    )
    old = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0])],
        "vec_id long, embedding array<double>",
    )
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    out = {r["cid"]: r for r in
           list_growth(old, empty, cents).collect()}
    assert sorted(out) == [0, 1]
    for r in out.values():
        assert r["n_new"] == 0 and r["growth_permille"] == 0
        assert r["recluster"] == 0  # nothing arrived, nothing drifts


def test_list_growth_empty_trained_list_flags(spark):
    """A codebook list nothing trained into must flag recluster."""
    from m5_competition_kaggle_spark.operators.ivf_maintain import (
        list_growth,
    )

    cents = spark.createDataFrame(
        [(0, [0]), (7, [7000])], "cid long, cv array<bigint>"
    )
    old = spark.createDataFrame(
        [(1, [0.0])], "vec_id long, embedding array<double>"
    )
    new = spark.createDataFrame(
        [(2, [7.0])], "vec_id long, embedding array<double>"
    )
    out = {r["cid"]: r for r in
           list_growth(old, new, cents).collect()}
    assert out[7]["n_old"] == 0 and out[7]["recluster"] == 1
    assert out[7]["growth_permille"] is None


def test_pq_distortion_rejects_bad_m(spark):
    from m5_competition_kaggle_spark.operators.pq_eval import (
        pq_distortion,
    )

    df = spark.createDataFrame(
        [(0, [0.0] * 8)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="divide"):
        pq_distortion(df, m=3, n_codes=1, dim=8)


def test_lsh_power_rejects_non_power_of_two():
    from m5_competition_kaggle_spark.operators.lsh_power import (
        capture_ppm_sql,
    )

    with pytest.raises(ValueError, match="power of two"):
        capture_ppm_sql("j", 3, 4, "DIV")
    with pytest.raises(ValueError, match="power of two"):
        capture_ppm_sql("j", 4, 0, "DIV")
