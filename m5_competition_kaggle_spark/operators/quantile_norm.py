"""Quantile normalization across sources — exact integer rank mapping.

The cross-source feature equalizer: each source's score distribution is
mapped ONTO the pooled global distribution, so a "0.9-quantile doc" from
a verbose source and one from a terse source land on the same normalized
value. For a row at within-source rank r (of n_s) the target is the
global order statistic at position

    p = 1 + ((r - 1) * (N - 1)) DIV (n_s - 1)        (n_s > 1)
    p = 1 + (N - 1) DIV 2                            (singleton source)

— pure integer arithmetic, deterministic under the (value, id) total
order, so the normalization hash-certifies row-for-row.

Scale design: within-source ranks are partitioned windows; the GLOBAL
order statistics come from the two-phase range-partitioned prefix scan
(``operators/prefix.global_running_sum``) — never a single-partition
global window. The position lookup is a keyed equi-join of two
corpus-sized but balanced tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from m5_competition_kaggle_spark.operators.prefix import (
    global_running_sum,
)


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Map each row's within-``group_col`` rank of ``value_col`` onto
    the pooled global distribution of ``value_col``.

    Output: id_col, group_col, value_col, src_rank, src_n, mapped_pos
    and norm_value (the global order statistic at mapped_pos). The
    total order is (value, id) — ``id_col`` must be unique.
    """
    base = df.select(group_col, value_col, id_col)
    w_src = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = base.withColumn(
        "src_rank", F.row_number().over(w_src).cast("long")
    ).withColumn(
        "src_n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )

    pos = (
        global_running_sum(
            base.withColumn("__one", F.lit(1)),
            "__one",
            (value_col, id_col),
            "pos",
        )
        .select(
            F.col("pos"), F.col(value_col).alias("norm_value")
        )
    )
    # N arrives via a 1-row aggregate broadcast, not a global window.
    total = pos.agg(F.max("pos").alias("__N"))
    mapped = (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            "mapped_pos",
            F.when(
                F.col("src_n") > 1,
                1
                + F.expr(
                    "(CAST(src_rank - 1 AS BIGINT) * (__N - 1))"
                    " DIV (src_n - 1)"
                ),
            ).otherwise(1 + F.expr("(__N - 1) DIV 2")),
        )
        .drop("__N")
    )
    return mapped.join(
        pos, mapped.mapped_pos == pos.pos
    ).select(
        id_col, group_col, value_col,
        "src_rank", "src_n", "mapped_pos", "norm_value",
    )
