"""Cumulative gains / lift table — the ranking-eval staple.

Calibration (x112) asks "are the scores honest probabilities"; nDCG
(x131) grades a retrieval list; the lift table answers the campaign /
curation question: if I take the TOP j/n of the corpus by this score,
how many of the positives do I capture, and how much better is that
than random?  Per score-ordered bucket:

    lift     = (cum_pos / cum_n) / (P / N)      — as exact permille
    capture  = cum_pos / P                       — as exact permille

Everything is integer: the global rank comes from the two-phase
range-partitioned prefix scan (never a single-partition sort of the
corpus — the x100 lesson), bucket = ((rank-1)·B) DIV N, and the
cumulative walk runs on the bounded B-row bucket table (a justified
bounded single-partition window, the q15 precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from m5_competition_kaggle_spark.operators.prefix import (
    global_running_sum,
)


def lift_table(
    df: DataFrame,
    score_col: str,
    pos_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Gains/lift table of ranking by ``score_col`` (descending, ties
    broken by ``id_col``) against the 0/1 ``pos_col``.

    Output per bucket 1..n_buckets: n, pos, cum_n, cum_pos,
    lift_permille and capture_permille; NULL lift columns when the
    corpus has no positives. NULL-scored rows are EXCLUDED: the
    ranking negates the score for a descending sort, and a NULL
    would sort ascending-nulls-first — i.e. silently claim the top
    ranks for exactly the rows the scorer never scored."""
    if n_buckets < 1:
        raise ValueError("need n_buckets >= 1")
    df = df.filter(F.col(score_col).isNotNull())
    base = df.select(
        F.col(id_col).alias("__id"),
        (-F.col(score_col)).alias("__neg"),
        F.col(pos_col).cast("long").alias("__pos"),
        F.lit(1).alias("__one"),
    )
    ranked = global_running_sum(
        base, "__one", ("__neg", "__id"), "__rank"
    )
    tot = ranked.agg(
        F.max("__rank").alias("__N"),
        F.sum("__pos").alias("__P"),
    )
    bucketed = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(
            "bucket",
            F.expr(f"((__rank - 1) * {n_buckets}) DIV __N") + 1,
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__pos").alias("pos"),
            F.max("__N").alias("__N"),
            F.max("__P").alias("__P"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        bucketed.withColumn("cum_n", F.sum("n").over(w))
        .withColumn("cum_pos", F.sum("pos").over(w))
        .withColumn(
            "lift_permille",
            F.when(
                F.col("__P") > 0,
                F.expr(
                    "(1000 * cum_pos * __N) DIV (cum_n * __P)"
                ),
            ),
        )
        .withColumn(
            "capture_permille",
            F.when(
                F.col("__P") > 0,
                F.expr("(1000 * cum_pos) DIV __P"),
            ),
        )
        .select(
            "bucket", "n", "pos", "cum_n", "cum_pos",
            "lift_permille", "capture_permille",
        )
    )
