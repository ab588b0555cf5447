"""Exact weighted quantiles — integer order statistics on weight mass.

g8 takes unweighted quantiles; x52 sketches them; a weighted corpus
(importance weights x27/x126, repetition counts, quantity-weighted
prices) needs the weighted form: the q-quantile is the smallest value
v whose cumulative weight reaches q of the total,

    wq(q) = min { v : den·cumw(v) >= num·W }        (q = num/den)

Pure integer comparisons — no interpolation, no floats — so the
result hash-certifies. Ties are a non-issue by construction: values
collapse to (v, Σw) cells BEFORE the cumulative walk, so cumw(v) is
the order-independent mass at-or-below v.

Scale design: one keyed (group, v) pre-aggregation bounds the window
input at |distinct values| per group; the cumulative walk and the
min-qualifying-value picks ride a single partitioned sort. No global
windows, no second pass over the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def weighted_quantiles(
    df: DataFrame,
    group_cols: list[str],
    v_col: str,
    w_col: str,
    quantiles: list[tuple[int, int]] = ((1, 4), (1, 2), (3, 4)),
) -> DataFrame:
    """Per-group exact weighted quantiles of BIGINT ``v_col`` under
    positive BIGINT ``w_col``, at the rational points ``quantiles``
    (num, den).

    Output per group: n (rows), w_total, and one ``wq_<num>_<den>``
    column per requested quantile. Overflow contract:
    den·W < 2^63."""
    for num, den in quantiles:
        if not (0 < num <= den):
            raise ValueError("need 0 < num <= den per quantile")
    # Positive weights are the correctness precondition (a zero or
    # negative weight makes the cumulative mass non-monotone, so the
    # "smallest qualifying v" rule silently returns garbage) —
    # enforce it per row, JVM-side, instead of trusting the caller.
    w_checked = F.when(F.col(w_col) > 0, F.col(w_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("weighted_quantiles needs positive weights; got "),
                F.coalesce(F.col(w_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    cells = df.groupBy(*group_cols, v_col).agg(
        F.sum(w_checked).alias("__w"),
        F.count(F.lit(1)).alias("__n"),
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(v_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    walked = cells.withColumn(
        "__cumw", F.sum("__w").over(w_cum)
    ).withColumn("__W", F.sum("__w").over(w_all))
    aggs = [
        F.sum("__n").alias("n"),
        F.max("__W").alias("w_total"),
    ]
    for num, den in quantiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("__cumw") * den >= F.col("__W") * num,
                    F.col(v_col),
                )
            ).alias(f"wq_{num}_{den}")
        )
    return walked.groupBy(*group_cols).agg(*aggs)
