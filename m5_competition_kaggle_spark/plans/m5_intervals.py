"""Prediction INTERVALS around the pipeline's point forecasts —
split-conformal calibration, the third leg of the self-evaluation
loop (RMSSE scores the points, SPL scores the benchmark quantiles;
this wraps the pipeline's OWN forecasts in finite-sample-valid
intervals and measures that the promise holds).

Method (the x127 operator, applied to forecasting): nonconformity
score = |y − ŷ| on a CALIBRATION window of held-out predictions;
per-group threshold q̂ = the k-th smallest score with the
finite-sample correction k = ceil((n+1)(1−α)); the interval for a
new forecast is ŷ ± q̂, guaranteed ≥ 1−α marginal coverage if
calibration and evaluation draws are exchangeable. The EVAL window
then measures the achieved coverage — drift between the two windows
shows up as under-coverage, which is exactly what the number is for.

Scale design: residuals are one keyed join (id, date) of predictions
onto actuals; thresholds are per-group windows over the calibration
rows (`operators/conformal.py` — never global); the interval check
is one broadcast of the tiny (groups × alphas) threshold table back
onto eval rows plus a keyed aggregate. Quantization ×1000 keeps it
all int64, like the RMSSE stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.conformal import (
    conformal_threshold,
)

QUANT = 1000

# (alpha_num, alpha_den): 10% and 33% miscoverage — the 90% and 67%
# bands a replenishment planner actually uses.
DEFAULT_ALPHAS = ((1, 10), (1, 3))


def _residuals(actuals_long: DataFrame, preds: DataFrame) -> DataFrame:
    p = preds.filter(F.col("pred_units_sold").isNotNull()).select(
        "id",
        "store_id",
        F.col("pred_date").alias("date"),
        F.expr(
            f"CAST(round(pred_units_sold * {QUANT}) AS BIGINT)"
        ).alias("__yhat_q"),
    )
    return (
        actuals_long.select(
            "id",
            "date",
            (F.col("units_sold").cast("bigint") * QUANT).alias("__y_q"),
        )
        .join(p, ["id", "date"])
        .withColumn(
            "__abs_err", F.abs(F.col("__y_q") - F.col("__yhat_q"))
        )
    )


def conformal_forecast_intervals(
    actuals_long: DataFrame,
    preds: DataFrame,
    calib_end: str,
    alphas: tuple[tuple[int, int], ...] = DEFAULT_ALPHAS,
) -> DataFrame:
    """Calibrate per-store conformal intervals on predictions dated
    ≤ ``calib_end`` and measure their coverage on the later ones.

    ``actuals_long``: (id, date, units_sold). ``preds``:
    ``predict_per_group`` output (id, store_id, pred_date,
    pred_units_sold). Output per (store_id, alpha_num, alpha_den):
    n_calib, q_hat (half-width, x1000 units; NULL when the
    calibration set is too small for the finite-sample guarantee),
    n_eval, n_in, cover_permille, target_permille (= 1000·(1−α)) and
    mean_width_x1000 (= 2·q_hat). Eval rows are dropped for a NULL
    q_hat — no guarantee exists to check."""
    res = _residuals(actuals_long, preds)
    end = F.lit(calib_end).cast("date")
    calib = res.filter(F.col("date") <= end)
    ev = res.filter(F.col("date") > end)

    tables = []
    for an, ad in alphas:
        th = conformal_threshold(
            calib, ["store_id"], "__abs_err", an, ad
        ).select(
            "store_id",
            F.lit(int(an)).alias("alpha_num"),
            F.lit(int(ad)).alias("alpha_den"),
            F.col("n").alias("n_calib"),
            "q_hat",
            F.expr(f"1000 * ({ad} - {an}) DIV {ad}").alias(
                "target_permille"
            ),
        )
        tables.append(th)
    thresholds = tables[0]
    for t in tables[1:]:
        thresholds = thresholds.unionByName(t)

    scored = (
        ev.join(
            F.broadcast(thresholds.filter(F.col("q_hat").isNotNull())),
            "store_id",
        )
        .withColumn(
            "__in",
            (F.col("__abs_err") <= F.col("q_hat")).cast("long"),
        )
        .groupBy(
            "store_id", "alpha_num", "alpha_den", "n_calib",
            "q_hat", "target_permille",
        )
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum("__in").cast("long").alias("n_in"),
        )
    )
    return scored.select(
        "store_id", "alpha_num", "alpha_den", "n_calib", "q_hat",
        "n_eval", "n_in",
        F.expr("1000 * n_in DIV n_eval").alias("cover_permille"),
        "target_permille",
        (F.lit(2) * F.col("q_hat")).alias("mean_width_x1000"),
    )
