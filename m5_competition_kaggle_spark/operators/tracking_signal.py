"""Forecast tracking signal — the forecasting-ops BIAS monitor.

RMSSE (x138) and SPL (x140) score forecast MAGNITUDE; neither says
whether a forecaster is systematically high or low. The classical
control chart for that is the tracking signal: cumulative error over
mean absolute deviation,

    TS = Σe / (Σ|e| / n)        e_t = y_t − ŷ_t

with |TS| persistently beyond ~4 flagging a biased forecaster that
needs re-fitting. All-integer on quantized series:

    ts_x100  = 100·err_sum·n DIV abs_err_sum
    bias_permille = 1000·err_sum DIV abs_err_sum  ∈ [−1000, 1000]

(both NULL for an exact forecaster — Σ|e| = 0 has no bias to scale).

Scale design: ONE keyed aggregate over (actual, forecast) pairs the
caller supplies (typically one lag window to build a naive baseline,
or a join against a prediction table) — map-side combinable, no
window in the operator itself. Overflow: 100·err_sum·n needs
|Σe|·n < 9·10¹⁶ — rescale the series quantization for longer or
larger-valued series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tracking_signal(
    df: DataFrame,
    key_col: str,
    actual_col: str,
    forecast_col: str,
) -> DataFrame:
    """Per-key forecast bias over BIGINT (actual, forecast) pairs;
    rows with a NULL forecast (warm-up periods) are ignored.

    Output per key: n, err_sum, abs_err_sum, bias_permille,
    ts_x100."""
    e = F.col(actual_col) - F.col(forecast_col)
    agg = (
        df.filter(F.col(forecast_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(e).cast("long").alias("err_sum"),
            F.sum(F.abs(e)).cast("long").alias("abs_err_sum"),
        )
    )
    return agg.select(
        key_col,
        "n",
        "err_sum",
        "abs_err_sum",
        F.when(
            F.col("abs_err_sum") > 0,
            F.expr("1000 * err_sum DIV abs_err_sum"),
        ).alias("bias_permille"),
        F.when(
            F.col("abs_err_sum") > 0,
            F.expr("100 * err_sum * n DIV abs_err_sum"),
        ).alias("ts_x100"),
    )
