"""plans/m5_intervals.py — split-conformal intervals around pipeline
forecasts, hand-checkable calibration and coverage."""

from __future__ import annotations

import datetime

from m5_competition_kaggle_spark.plans.m5_intervals import (
    conformal_forecast_intervals,
)


def _rows(store, start, actual_pred_pairs):
    d0 = datetime.date.fromisoformat(start)
    acts, preds = [], []
    for i, (y, yhat) in enumerate(actual_pred_pairs):
        d = d0 + datetime.timedelta(days=i)
        sid = f"{store}_item"
        acts.append((sid, d, y))
        preds.append((sid, store, d, float(yhat)))
    return acts, preds


def test_hand_checked_threshold_and_coverage(spark):
    """19 calibration residuals |e| = 1..19 (x1000 grid), α = 1/10:
    k = ceil(20·9/10) = 18 → q̂ = 18000. Eval: errors 5, 18, 19 →
    2 of 3 inside."""
    pairs = [(10 + k, 10) for k in range(1, 20)]          # calib
    pairs += [(15, 10), (28, 10), (29, 10)]               # eval
    acts, preds = _rows("S1", "2016-01-01", pairs)
    a = spark.createDataFrame(
        acts, "id string, date date, units_sold bigint"
    )
    p = spark.createDataFrame(
        preds,
        "id string, store_id string, pred_date date,"
        " pred_units_sold double",
    )
    out = conformal_forecast_intervals(
        a, p, "2016-01-19", alphas=((1, 10),)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_calib"], r["q_hat"]) == (19, 18000)
    assert (r["n_eval"], r["n_in"], r["cover_permille"]) == (3, 2, 666)
    assert r["target_permille"] == 900
    assert r["mean_width_x1000"] == 36000


def test_too_small_calibration_drops_from_eval(spark):
    """n = 3 calibration rows at α = 1/10: k = ceil(4·9/10) = 4 > n →
    NULL threshold → the store contributes no eval rows (no guarantee
    to check), rather than a silently clamped interval."""
    pairs = [(12, 10), (13, 10), (14, 10), (15, 10), (16, 10)]
    acts, preds = _rows("S2", "2016-01-01", pairs)
    a = spark.createDataFrame(
        acts, "id string, date date, units_sold bigint"
    )
    p = spark.createDataFrame(
        preds,
        "id string, store_id string, pred_date date,"
        " pred_units_sold double",
    )
    out = conformal_forecast_intervals(
        a, p, "2016-01-03", alphas=((1, 10),)
    ).collect()
    assert out == []
    # a looser α the tiny set CAN support still yields a row
    out = conformal_forecast_intervals(
        a, p, "2016-01-03", alphas=((1, 2),)
    ).collect()
    assert len(out) == 1 and out[0]["q_hat"] is not None
