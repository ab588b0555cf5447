"""Offline single-changepoint detection per series — the batch
companion of the streaming CUSUM monitor (s16/x101 detect drift as it
arrives; this localizes WHERE a completed series' mean shifted, the
retrospective question a data-quality audit asks).

Statistic: the max-CUSUM mean-shift form. For a series y_1..y_n with
prefix sums S_t, the split quality at t is

    Q_t = (n·S_t − t·S_n)² / (t·(n−t))     (maximize over 1 <= t < n)

— the numerator root g_t = n·S_t − t·S_n is an exact int64 from ONE
keyed prefix-sum window, the denominator is index arithmetic, and the
argmax needs no second pass: rank by Q_t as a double (identical
(int, int) inputs give bit-identical IEEE quotients in Spark and
DuckDB) with a deterministic index tie-break. Certified outputs are
the exact integers (|g|, den, split index/position, direction) — the
double is only the selection ORDER.

Scale: one shuffle to build the per-key series aggregate, one keyed
window, one keyed top-1 (rank-filter). Row count entering the window
is |series| × |time buckets| — the caller controls bucket granularity
(daily here), never raw corpus rows. Overflow contract: |n·S_t| must
stay under ~9.2·10^18, i.e. bucket-sum × bucket-count < 9e18; rescale
the value (e.g. counts instead of permille sums) beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def best_mean_shift(
    series: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Per key: the single split 1 <= t < n maximizing the CUSUM
    mean-shift statistic over ``value_col`` ordered by ``time_col``.

    Output per key: n (series length), cp_idx (1-based index of the
    LAST point of the left segment), cp_t (that point's time), g_abs
    (=|n·S_t − t·S_n|, exact), den (=t·(n−t)), direction ('up' when
    the right segment mean is higher, 'down' otherwise, 'flat' when
    g = 0). Keys with n < 2 are dropped (no interior split)."""
    w_ord = Window.partitionBy(key_col).orderBy("__t")
    w_all = Window.partitionBy(key_col)
    cum = series.select(
        key_col,
        F.col(time_col).alias("__t"),
        F.col(value_col).alias("__y"),
    ).select(
        key_col,
        "__t",
        F.row_number().over(w_ord).alias("__i"),
        F.sum("__y")
        .over(
            w_ord.rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("__S"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("__y").over(w_all).alias("__Sn"),
    )
    splits = cum.filter(
        (F.col("__i") < F.col("n")) & (F.col("n") >= F.lit(2))
    ).select(
        key_col,
        "n",
        F.col("__i").alias("cp_idx"),
        F.col("__t").alias("cp_t"),
        (
            F.col("n") * F.col("__S") - F.col("__i") * F.col("__Sn")
        ).alias("__g"),
        (F.col("__i") * (F.col("n") - F.col("__i"))).alias("den"),
    )
    scored = splits.withColumn(
        "__q",
        (F.col("__g") * F.col("__g")).cast("double")
        / F.col("den").cast("double"),
    )
    w_rank = Window.partitionBy(key_col).orderBy(
        F.col("__q").desc(), F.col("cp_idx").asc()
    )
    best = scored.withColumn(
        "__r", F.row_number().over(w_rank)
    ).filter(F.col("__r") == 1)
    return best.select(
        key_col,
        "n",
        "cp_idx",
        "cp_t",
        F.abs(F.col("__g")).alias("g_abs"),
        "den",
        F.when(F.col("__g") < 0, F.lit("up"))
        .when(F.col("__g") > 0, F.lit("down"))
        .otherwise(F.lit("flat"))
        .alias("direction"),
    )
