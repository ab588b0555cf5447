"""The M5 UNCERTAINTY half of the self-evaluation loop.

The reference repo targets the Accuracy track (point forecasts;
``plans/m5_eval.py`` scores those with RMSSE). The sibling
Uncertainty track asks for NINE quantiles per series-day and scores
them with the scaled pinball loss. This plan runs the competition's
own published benchmark — the empirical train-quantile forecaster —
over the full series grid and scores it with
``operators/pinball.scaled_pinball_loss`` at the competition's
levels, making the engine self-evaluating on BOTH tracks.

Scale design: the series table is the (id × calendar) long grid the
Accuracy eval already scans; the pinball operator adds one per-id
rank window over the train rows, a broadcast 9-row level table, and
keyed joins whose rank-equality Catalyst folds into the equi-join key
(verified in the executed plan — no |train|×|levels| blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.pinball import (
    scaled_pinball_loss,
)

# The competition's nine quantile levels, in permille.
M5_LEVELS = (5, 25, 165, 250, 500, 750, 835, 975, 995)


def evaluate_quantile_benchmark(
    spark: SparkSession,
    actuals_long: DataFrame,
    train_end: str,
    horizon: int = 28,
    levels_permille: tuple[int, ...] = M5_LEVELS,
) -> DataFrame:
    """Score the empirical-train-quantile forecaster per (id, u).

    ``actuals_long``: the observed series — columns ``id``, ``date``,
    ``units_sold`` — DENSE through ``train_end`` + ``horizon`` days
    for every id (the M5 wide grid guarantees this; the pinball
    operator splits at the GLOBAL max period, so a ragged calendar
    would misalign the horizon). Rows beyond the horizon are dropped
    here so the split lands exactly at ``train_end``.

    Output: ``scaled_pinball_loss`` columns per (id, u) — spl_ppm is
    1e6 × the competition's per-series SPL ratio."""
    end = F.lit(train_end).cast("date")
    series = actuals_long.filter(
        F.col("date") <= F.date_add(end, int(horizon))
    ).select(
        "id",
        F.expr("unix_date(date)").cast("long").alias("__t"),
        F.col("units_sold").cast("long").alias("__y"),
    )
    return scaled_pinball_loss(
        spark, series, "id", "__t", "__y",
        horizon=int(horizon), levels_permille=levels_permille,
    )
