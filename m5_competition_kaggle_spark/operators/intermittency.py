"""Syntetos-Boylan-Croston (SBC) demand classification — the standard
quadrant chart that tells a forecasting pipeline WHICH method fits
each series (smooth → exponential smoothing, intermittent → Croston,
lumpy → SBA/bootstrapping, erratic → robust smoothing).

Companion to ``operators/croston.py``: Croston assumes intermittence;
this operator measures it. Per series the two classifying statistics
(Syntetos, Boylan & Croston 2005; cutoffs ADI = 1.32, CV² = 0.49):

- ADI  (average inter-demand interval) = (t_n − t_1) / (n − 1)
  over the n nonzero-demand periods;
- CV²  (squared coefficient of variation of demand sizes), taken as
  the population variant (n·Σq² − (Σq)²) / (Σq)².

Both thresholds are applied as exact integer cross-multiplications
(100·(t_n−t_1) ≥ 132·(n−1); 100·(n·Σq²−(Σq)²) ≥ 49·(Σq)²), and the
reported ADI/CV² are truncating-quotient centi-units — bit-identical
across Spark and DuckDB, so the classification hash-certifies.

Scale design: ONE keyed aggregate over the demand rows (map-side
combinable sums/counts/min/max), no window, no calendar grid — the
same never-materialize-zeros contract as Croston. Overflow contract:
the CV² cross-multiplication squares Σq, so per-series Σq must stay
below ~3·10⁹ demand units (int64 headroom); pre-scale ``q`` for
series with larger magnitudes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# SBC cutoffs as exact rationals: ADI >= 132/100, CV^2 >= 49/100.
ADI_NUM, ADI_DEN = 132, 100
CV2_NUM, CV2_DEN = 49, 100


def sbc_classes(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Classify each key's nonzero-demand series into the SBC quadrant.

    ``df``: one BIGINT ``value_col`` demand per (key, integer period
    ``order_col``); zero-demand periods must be absent (they define
    the intervals, not rows). Keys with fewer than two demands drop —
    ADI is undefined without an interval.

    Output per key: n_demands, adi_x100, cv2_x100 (truncating centi-
    units), sbc_class ∈ {smooth, intermittent, erratic, lumpy}."""
    st = (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_demands"),
            (F.max(order_col) - F.min(order_col)).alias("__span"),
            F.sum(F.col(value_col) * F.col(value_col))
            .cast("long")
            .alias("__sq2"),
            F.sum(value_col).cast("long").alias("__sq"),
        )
        .filter(F.col("n_demands") >= 2)
    )
    adi_hi = (
        F.lit(ADI_DEN) * F.col("__span")
        >= F.lit(ADI_NUM) * (F.col("n_demands") - 1)
    )
    cv2_num = (
        F.col("n_demands") * F.col("__sq2")
        - F.col("__sq") * F.col("__sq")
    )
    cv2_hi = (
        F.lit(CV2_DEN) * cv2_num
        >= F.lit(CV2_NUM) * F.col("__sq") * F.col("__sq")
    )
    return st.select(
        key_col,
        "n_demands",
        F.expr("100 * __span DIV (n_demands - 1)").alias("adi_x100"),
        F.expr(
            "100 * (n_demands * __sq2 - __sq * __sq)"
            " DIV (__sq * __sq)"
        ).alias("cv2_x100"),
        F.when(adi_hi & cv2_hi, F.lit("lumpy"))
        .when(adi_hi, F.lit("intermittent"))
        .when(cv2_hi, F.lit("erratic"))
        .otherwise(F.lit("smooth"))
        .alias("sbc_class"),
    )
