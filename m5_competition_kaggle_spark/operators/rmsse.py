"""RMSSE — the M5 competition's own forecast-accuracy metric.

The reference repo exists to win M5, and M5 scores RMSSE (the per-
series core of WRMSSE): forecast squared error scaled by the naive
one-step forecaster's in-sample squared error,

    RMSSE = sqrt( mean (y_t - yhat_t)²  /  mean (y_t - y_{t-1})² )

< 1 beats naive persistence, > 1 loses to it. This operator closes
the loop the reference leaves implicit: the engine can now EVALUATE
any deterministic forecaster it runs (the lag-7 stub of ml/train.py,
x135's Holt) with the competition's metric.

Determinism: both sums are EXACT int64 (quantized series), their
ratio is one IEEE division, and sqrt is a CORRECTLY-ROUNDED IEEE
operation (unlike ln/exp) — so rmsse_ppm is bit-stable across
engines with no rounding precedent needed.

Scale design: lags are per-series partitioned windows over the
bounded (series, period) table; the metric is one keyed aggregation.
Overflow contract: n·max|err|² < 2^63 per series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rmsse(
    df: DataFrame,
    series_cols: list[str],
    t_col: str,
    y_col: str,
    yhat_col: str,
    scale_flag_col: str | None = None,
) -> DataFrame:
    """Per-series RMSSE of ``yhat_col`` against BIGINT ``y_col`` in
    ``t_col`` order. Rows with NULL ``yhat_col`` (warm-up) are
    excluded from the error sum; the naive scale uses every
    consecutive pair — or, with ``scale_flag_col`` set (a boolean
    column), only pairs whose ROW has the flag true, the M5
    competition's exact convention of scaling by the TRAINING
    period's naive error while the error sum runs over the forecast
    horizon (reference ``pipeline.py`` trains to ``train_end`` and
    scores the following 28 days).

    Output per series: n_scored, sse (Σ err², exact), n_scale,
    scale_sse (Σ naive-diff², exact) and rmsse_ppm =
    round(1e6·sqrt((sse/n_scored)/(scale_sse/n_scale))); NULL when
    either denominator is empty or the scale is zero (a constant
    series has no naive error to scale by)."""
    w = Window.partitionBy(*series_cols).orderBy(t_col)
    base = df.withColumn("__prev", F.lag(y_col).over(w))
    err = F.col(y_col) - F.col(yhat_col)
    nd = F.col(y_col) - F.col("__prev")
    in_scale = F.col("__prev").isNotNull()
    if scale_flag_col is not None:
        in_scale = in_scale & F.col(scale_flag_col)
    base = base.withColumn("__in_scale", in_scale)
    agg = base.groupBy(*series_cols).agg(
        F.sum(
            F.when(F.col(yhat_col).isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_scored"),
        F.sum(
            F.when(F.col(yhat_col).isNotNull(), err * err)
            .otherwise(0)
        ).cast("long").alias("sse"),
        F.sum(
            F.when(F.col("__in_scale"), 1).otherwise(0)
        ).cast("long").alias("n_scale"),
        F.sum(
            F.when(F.col("__in_scale"), nd * nd)
            .otherwise(0)
        ).cast("long").alias("scale_sse"),
    )
    ratio = (
        F.col("sse").cast("double") / F.col("n_scored")
    ) / (F.col("scale_sse").cast("double") / F.col("n_scale"))
    return agg.withColumn(
        "rmsse_ppm",
        F.when(
            (F.col("n_scored") > 0)
            & (F.col("n_scale") > 0)
            & (F.col("scale_sse") > 0),
            F.round(F.lit(1e6) * F.sqrt(ratio)).cast("long"),
        ),
    )
