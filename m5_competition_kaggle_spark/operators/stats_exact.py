"""Exact-arithmetic grouped statistics: OLS sufficient sums, Gini
concentration, winsorized aggregation.

These are the "robust analytics" operators a 100 TB pipeline wants next
to plain GROUP BY aggregates: a per-group trend (is this event stream's
value drifting?), a per-group concentration index (is one user producing
half the traffic?), and an outlier-insensitive mean. All three are
single keyed aggregations (plus a window for the order-statistics
variants) — no driver-side math, no UDFs — and all arithmetic is
**integer** so results certify bit-for-bit against an ANSI-SQL twin
(x73 / x80 / x83).

Reference parity: the reference pipeline computes rolling/lag features
and simple means (reference ``pipeline.py:102-122``); these operators
extend that family with the trend/robustness statistics its notebooks
derive offline.

Scale notes
-----------
- ``group_ols_sums`` emits the slope as an exact rational
  (``slope_num``/``slope_den``) built from BIGINT sufficient sums. The
  caller must keep ``n * max|x| * max|y|`` within int64 — center/shift
  x (we take x as a small day-index) and quantize y coarsely enough.
  For corpus-scale fits, first aggregate per (group, x) — the sums are
  identical and n collapses to the number of distinct x.
- ``gini_by_rank`` uses the sorted-rank identity
  ``G = (2*Σ i·v_i − (k+1)·Σv) / (k·Σv)`` — one window rank + one
  aggregate per group, O(k log k) not O(k²) pairs.
- ``winsorized_sum`` clamps by exact order statistics computed from
  the same single sort (row_number + windowed conditional max), so a
  group is shuffled exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_ols_sums(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group OLS sufficient statistics + exact rational slope.

    ``x_col``/``y_col`` must already be integer (LongType) columns.
    Output: group, n, sx, sy, sxx, sxy,
    ``slope_num = n*sxy - sx*sy``, ``slope_den = n*sxx - sx*sx``
    (slope = num/den; den = 0 ⇔ x is constant in the group).
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(x * y).alias("sxy"),
        )
        .select(
            group_col,
            "n",
            "sx",
            "sy",
            "sxx",
            "sxy",
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
                "slope_num"
            ),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
                "slope_den"
            ),
        )
    )


def gini_by_rank(
    df: DataFrame, group_col: str, value_col: str, tiebreak_col: str
) -> DataFrame:
    """Per-group Gini concentration of non-negative integer ``value_col``
    as an exact rational (``gini_num``/``gini_den``).

    Ranks ascending by (value, tiebreak) — the tiebreak only fixes the
    sort, the identity is tie-invariant. Output: group, k (members),
    sum_v, gini_num = 2*Σ(i·v_i) − (k+1)·Σv, gini_den = k·Σv.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col), F.col(tiebreak_col)
    )
    ranked = df.select(
        group_col,
        F.col(value_col).cast("long").alias("__v"),
        F.row_number().over(w).cast("long").alias("__i"),
    )
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("__v").alias("sum_v"),
            F.sum(F.col("__i") * F.col("__v")).alias("__siv"),
        )
        .select(
            group_col,
            "k",
            "sum_v",
            (
                F.lit(2) * F.col("__siv")
                - (F.col("k") + F.lit(1)) * F.col("sum_v")
            ).alias("gini_num"),
            (F.col("k") * F.col("sum_v")).alias("gini_den"),
        )
    )


def winsorized_sum(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    tail_denominator: int = 10,
) -> DataFrame:
    """Per-group winsorized sum: the lowest and highest
    ``n // tail_denominator`` values are clamped to the nearest
    surviving order statistics before summing (integer-exact).

    Output: group, n, cut (= n // tail_denominator), lo_v, hi_v
    (the clamp values), wsum (sum after clamping).

    ``tail_denominator`` must be >= 3: below that the two cut tails can
    overlap (2*cut >= n), leaving lo_v > hi_v and an asymmetric clamp
    (ADVICE r6) — winsorizing a third or more off each tail is not a
    meaningful request anyway.
    """
    if int(tail_denominator) < 3:
        raise ValueError(
            "tail_denominator must be >= 3 (got "
            f"{tail_denominator}): 2*(n DIV d) can reach n below that, "
            "overlapping the clamp tails"
        )
    w_order = Window.partitionBy(group_col).orderBy(
        F.col("__v"), F.col("__t")
    )
    w_all = Window.partitionBy(group_col)
    ranked = df.select(
        group_col,
        F.col(value_col).cast("long").alias("__v"),
        F.col(tiebreak_col).alias("__t"),
    ).withColumn("__r", F.row_number().over(w_order).cast("long"))
    ranked = ranked.withColumn("__n", F.count(F.lit(1)).over(w_all))
    # DIV truncates toward zero == floor for the non-negative count, and
    # matches SQL integer division exactly.
    ranked = ranked.withColumn(
        "__cut", F.expr(f"__n DIV {int(tail_denominator)}")
    )
    ranked = ranked.withColumn(
        "__lo",
        F.max(
            F.when(F.col("__r") == F.col("__cut") + 1, F.col("__v"))
        ).over(w_all),
    ).withColumn(
        "__hi",
        F.max(
            F.when(F.col("__r") == F.col("__n") - F.col("__cut"), F.col("__v"))
        ).over(w_all),
    )
    clamped = F.when(F.col("__v") < F.col("__lo"), F.col("__lo")).otherwise(
        F.when(F.col("__v") > F.col("__hi"), F.col("__hi")).otherwise(
            F.col("__v")
        )
    )
    return (
        ranked.groupBy(group_col)
        .agg(
            F.max("__n").alias("n"),
            F.max("__cut").alias("cut"),
            F.max("__lo").alias("lo_v"),
            F.max("__hi").alias("hi_v"),
            F.sum(clamped).alias("wsum"),
        )
    )
