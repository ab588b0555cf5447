"""Median/MAD robust statistics — the breakdown-resistant siblings of
``operators/stats_exact.py``'s winsorized aggregate.

The median absolute deviation is the standard robust scale estimate: a
50% breakdown point where stddev has 0% (one corrupt reading moves a
z-score filter; it cannot move MAD). The classic robust outlier rule is
``|v − median| > c · MAD``; with integer values the whole rule is
integer-exact, so it certifies bit-for-bit against a SQL twin (x84).

Cost shape: both medians are EXACT order statistics computed from
window ranks — two sorts over the SAME group partitioning, i.e. one
shuffle on the group key, no driver-side percentile collection and no
approximate sketch (x52 holds the sketch flank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    c: int = 3,
) -> DataFrame:
    """Per-group robust outlier profile with integer arithmetic.

    median = value at rank (n+1) DIV 2 under (value, tiebreak) order
    (the lower median — deterministic for even n); MAD = the same
    statistic over |v − median|. Output: group, n, med, mad,
    n_outliers (= #rows with |v − med| > c · MAD).
    """
    w_all = Window.partitionBy(group_col)
    base = df.select(
        group_col,
        F.col(value_col).cast("long").alias("__v"),
        F.col(tiebreak_col).alias("__t"),
    )
    w1 = Window.partitionBy(group_col).orderBy(F.col("__v"), F.col("__t"))
    ranked = base.withColumn(
        "__r", F.row_number().over(w1).cast("long")
    ).withColumn("__n", F.count(F.lit(1)).over(w_all))
    ranked = ranked.withColumn(
        "__med",
        F.max(
            F.when(F.col("__r") == F.expr("(__n + 1) DIV 2"), F.col("__v"))
        ).over(w_all),
    )
    dev = ranked.withColumn("__d", F.abs(F.col("__v") - F.col("__med")))
    w2 = Window.partitionBy(group_col).orderBy(F.col("__d"), F.col("__t"))
    dev = dev.withColumn(
        "__r2", F.row_number().over(w2).cast("long")
    ).withColumn(
        "__mad",
        F.max(
            F.when(F.col("__r2") == F.expr("(__n + 1) DIV 2"), F.col("__d"))
        ).over(w_all),
    )
    return (
        dev.groupBy(group_col)
        .agg(
            F.max("__n").alias("n"),
            F.max("__med").alias("med"),
            F.max("__mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("__d") > F.lit(int(c)) * F.col("__mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )
