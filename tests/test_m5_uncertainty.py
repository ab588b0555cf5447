"""plans/m5_uncertainty.py — the Uncertainty-track self-evaluation:
the empirical-quantile benchmark scored with the pinball operator on
a hand-checkable grid."""

from __future__ import annotations

import datetime

from m5_competition_kaggle_spark.plans.m5_uncertainty import (
    M5_LEVELS,
    evaluate_quantile_benchmark,
)


def _grid(vals_by_id, start="2016-01-01"):
    d0 = datetime.date.fromisoformat(start)
    rows = []
    for sid, vals in vals_by_id.items():
        for i, v in enumerate(vals):
            rows.append((sid, d0 + datetime.timedelta(days=i), v))
    return rows


def test_hand_checked_median_series(spark):
    """Train 0..19 (values 1..20), horizon 2 at the grid end; u=500:
    fcst = k-th smallest with k = ceil(500·20/1000) = 10 → value 10."""
    rows = _grid({"a": list(range(1, 21)) + [10, 30]})
    df = spark.createDataFrame(
        rows, "id string, date date, units_sold bigint"
    )
    out = evaluate_quantile_benchmark(
        spark, df, "2016-01-20", horizon=2, levels_permille=(500,)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_train"], r["n_eval"], r["fcst"]) == (20, 2, 10)
    # pinball: y=10 → 0; y=30 → 500·20 = 10000; scale_num 19, n_diff 19
    assert r["pin_sum"] == 10000
    assert r["spl_ppm"] == 1000 * 10000 * 19 // (2 * 19)

    # rows past the horizon must not shift the split
    rows_extra = _grid({"a": list(range(1, 21)) + [10, 30, 999, 999]})
    df = spark.createDataFrame(
        rows_extra, "id string, date date, units_sold bigint"
    )
    r2 = evaluate_quantile_benchmark(
        spark, df, "2016-01-20", horizon=2, levels_permille=(500,)
    ).collect()[0]
    assert (r2["fcst"], r2["pin_sum"]) == (r["fcst"], r["pin_sum"])


def test_m5_levels_shape(spark):
    """All nine official levels come back per series; constant-train
    series score NULL (no naive scale)."""
    rows = _grid({
        "a": [1, 5, 2, 8, 3, 9, 4, 7, 6, 10, 5, 5],
        "b": [7] * 12,
    })
    df = spark.createDataFrame(
        rows, "id string, date date, units_sold bigint"
    )
    out = evaluate_quantile_benchmark(
        spark, df, "2016-01-09", horizon=3
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id["a"]) == len(M5_LEVELS) == 9
    assert sorted(r["u"] for r in by_id["a"]) == sorted(M5_LEVELS)
    assert all(r["spl_ppm"] is not None for r in by_id["a"])
    assert all(r["spl_ppm"] is None for r in by_id["b"])
    # monotone forecasts in u for series a (order statistics)
    fc = {r["u"]: r["fcst"] for r in by_id["a"]}
    us = sorted(fc)
    assert all(fc[u1] <= fc[u2] for u1, u2 in zip(us, us[1:]))
