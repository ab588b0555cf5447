"""Welch two-sample A/B readout from exact integer sufficient stats.

The experimentation counterpart of the drift monitors: PSI/KS ask
"did the distribution move", an A/B readout asks "did the TREATMENT
arm move the mean, relative to the variance" — the number an
experiment dashboard reports per metric. Welch's t² (the unequal-
variance form) is used because arms are never guaranteed
variance-matched.

Determinism: the input value column is pre-quantized BIGINT (the
QUANT precedent), so the per-arm sufficient statistics (n, Σq, Σq²)
are EXACT int64 sums; the t² statistic is then a pure-arithmetic
double expression (+, -, *, / only — every step IEEE correctly
rounded, no transcendentals) evaluated in the identical order by the
SQL oracle, the x107/x114 shared-expression-tree precedent. Output
rows carry both: the exact integers certify the data, the double
certifies the arithmetic.

Scale design: one keyed partial-aggregating shuffle on (group, arm)
— map-side combine reduces each partition to one sufficient-stat row
per cell before the exchange — then a 2-row-per-group pivot. No
second pass, no driver math. Overflow contract: Σq² must stay below
2^63 (n · max(q)² < 9.2e18; for the x1000 event grid that holds to
~38M rows per arm per group — quantize coarser for bigger arms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _welch_t2(
    n_a: Column, s_a: Column, ss_a: Column,
    n_b: Column, s_b: Column, ss_b: Column,
) -> Column:
    """Welch t² as a fixed-shape double expression tree. NULL when an
    arm has n < 2 or the pooled standard-error denominator is 0."""
    da, db = s_a.cast("double"), s_b.cast("double")
    ma, mb = da / n_a, db / n_b
    va = (ss_a.cast("double") - da * da / n_a) / (n_a - F.lit(1))
    vb = (ss_b.cast("double") - db * db / n_b) / (n_b - F.lit(1))
    den = va / n_a + vb / n_b
    return F.when(
        (n_a >= 2) & (n_b >= 2) & (den > 0),
        (ma - mb) * (ma - mb) / den,
    )


def welch_from_stats(agg: DataFrame) -> DataFrame:
    """Append ``welch_t2`` to a sufficient-statistics table with
    columns n_a, n_b, sum_a, sum_b, ss_a, ss_b (any key columns ride
    along) — the shared kernel of the one-shot readout and the
    streaming per-day trajectory (s19), so stream == batch is an
    arithmetic identity."""
    return agg.withColumn(
        "welch_t2",
        _welch_t2(
            F.col("n_a"), F.col("sum_a"), F.col("ss_a"),
            F.col("n_b"), F.col("sum_b"), F.col("ss_b"),
        ),
    )


def arm_sufficient_stats(
    df: DataFrame, group_cols, arm_col: str, q_col: str
) -> DataFrame:
    """One keyed partial-aggregating pass to per-``group_cols``
    sufficient statistics of arms 0/1 (other arm values dropped)."""
    q = F.col(q_col)
    # n counts only rows whose q is non-NULL — otherwise a NULL
    # measurement would inflate n while contributing nothing to the
    # sums, silently deflating the arm mean.
    is_a = (F.col(arm_col) == 0) & q.isNotNull()
    is_b = (F.col(arm_col) == 1) & q.isNotNull()
    return (
        df.filter(is_a | is_b)
        .groupBy(*group_cols)
        .agg(
            F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(is_b, 1).otherwise(0)).alias("n_b"),
            F.sum(F.when(is_a, q).otherwise(0)).alias("sum_a"),
            F.sum(F.when(is_b, q).otherwise(0)).alias("sum_b"),
            F.sum(F.when(is_a, q * q).otherwise(0)).alias("ss_a"),
            F.sum(F.when(is_b, q * q).otherwise(0)).alias("ss_b"),
        )
    )


def welch_readout(
    df: DataFrame,
    group_col: str,
    arm_col: str,
    q_col: str,
) -> DataFrame:
    """Per-group Welch readout between arm 0 (control) and arm 1
    (treatment) of ``arm_col`` over the quantized BIGINT ``q_col``.

    Output per group: n_a, n_b, sum_a, sum_b, ss_a, ss_b (exact
    BIGINT sufficient statistics) and welch_t2 (double, NULL when
    undefined). Rows of other arm values are ignored; a group with
    rows in only ONE of arms 0/1 surfaces with the other arm's
    counts zero and NULL t², but a group with NO arm-0/1 rows at all
    emits no row (it is not part of the experiment).
    """
    return welch_from_stats(
        arm_sufficient_stats(df, [group_col], arm_col, q_col)
    )
