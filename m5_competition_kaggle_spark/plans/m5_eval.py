"""Close the M5 loop: score the pipeline's own predictions with the
competition metric.

The reference repo trains, predicts and writes a submission
(``pipeline.py:358-382``) but never scores it locally — the Kaggle
leaderboard was the evaluator. This stage makes the engine
self-evaluating: join ``ml/predict.predict_per_group`` output back
onto the observed long series and run ``operators/rmsse.rmsse`` —
per-series RMSSE with the scale term restricted to the TRAINING
window, exactly the competition's convention (numerator over the
forecast horizon, denominator over in-sample naive error).

Everything is one broadcast-or-keyed join plus the rmsse operator's
single window pass; both sides arrive quantized to integer permille
so the sums certify exactly. Predictions for dates with no observed
truth (a true future horizon) simply drop out of the inner join —
the metric only ever scores days with ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.rmsse import rmsse

QUANT = 1000


def evaluate_forecast(
    actuals_long: DataFrame,
    preds: DataFrame,
    train_end: str,
) -> DataFrame:
    """Per-series RMSSE of the pipeline predictions.

    ``actuals_long``: the observed series — columns ``id``, ``date``,
    ``units_sold`` (the ``process_inputs`` long table). ``preds``:
    ``predict_per_group`` output (``id``, ``pred_date``,
    ``pred_units_sold``; NULL prediction rows are ignored).
    ``train_end``: last training date (ISO) — naive-scale pairs are
    counted only at or before it, per the M5 definition.

    Output per ``id``: n_scored, sse, n_scale, scale_sse (exact int64
    on the x1000 grid) and rmsse_ppm (NULL when the training series
    is constant — no naive error to scale by). < 1e6 beats naive
    persistence.
    """
    p = preds.filter(F.col("pred_units_sold").isNotNull()).select(
        "id",
        F.col("pred_date").alias("date"),
        F.expr(
            f"CAST(round(pred_units_sold * {QUANT}) AS BIGINT)"
        ).alias("__yhat_q"),
    )
    joined = (
        actuals_long.select(
            "id",
            "date",
            (F.col("units_sold").cast("bigint") * QUANT).alias("__y_q"),
        )
        .join(p, ["id", "date"], "left")
        .withColumn(
            "__in_train", F.col("date") <= F.lit(train_end).cast("date")
        )
    )
    return rmsse(
        joined, ["id"], "date", "__y_q", "__yhat_q",
        scale_flag_col="__in_train",
    )
