"""Kneser-Ney-smoothed bigram language model as exact integer rationals.

The component table behind interpolated Kneser-Ney (Kneser & Ney 1995;
Chen & Goodman 1998) — the classic n-gram smoother — with discount
d = 1/2 so the smoothed probability is an EXACT rational:

    P_kn(w2 | w1) = max(c12 − d, 0)/c1  +  (d · N1+(w1·)/c1) · P_cont(w2)
    P_cont(w2)    = N1+(·w2) / N1+(··)

With d = 1/2 and every count an integer:

    P_kn = [ (2·c12 − 1)·types + n1p_w1 · cont_w2 ] / [ 2·c1 · types ]

(for observed bigrams, c12 ≥ 1 so the discount never clips), where
c1 = Σ_w c(w1 w), n1p_w1 = |{w : c(w1 w) > 0}|, cont_w2 =
|{w : c(w w2) > 0}|, types = total distinct bigram types. Numerator
and denominator are int64-exact, so the smoothed LM certifies
bit-for-bit against a SQL twin (x90) — no float log-space arithmetic.

Cost shape: one bigram explode (linear in tokens), then FOUR keyed
aggregates (bigram counts, left-context totals+fanouts, right
continuation counts, one global 1-row type count broadcast) — every
one map-side combinable; the output is bounded by the distinct-bigram
table, and the certified query caps it at the top-N bigrams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kneser_ney_components(
    df: DataFrame, text_col: str, top_n: int = 100
) -> DataFrame:
    """Top-``top_n`` bigrams (by c12 DESC, w1, w2) with their exact
    KN components and the d=1/2 rational probability.

    Output: w1, w2, c12, c1, n1p_w1, cont_w2, types,
    pkn_num = (2·c12−1)·types + n1p_w1·cont_w2, pkn_den = 2·c1·types.
    """
    words = df.select(
        F.split(
            F.trim(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " ")
            ),
            " +",
        ).alias("ws")
    ).filter(F.size("ws") >= 2)
    bigrams = words.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(ws, 1, size(ws) - 1)").alias("w1"),
                F.expr("slice(ws, 2, size(ws) - 1)").alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bc = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    left = bc.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_w1")
    )
    right = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("cont_w2"))
    types = bc.agg(F.count(F.lit(1)).alias("types"))
    # top-N via orderBy+limit, NOT a global row_number window: the
    # distinct-bigram table is vocabulary²-sized at corpus scale, and
    # the unpartitioned window would sort ALL of it on one partition.
    # Catalyst plans orderBy().limit() as TakeOrderedAndProject —
    # per-partition partial top-N, then a merge of n_partitions·N
    # candidates. Identical rows (the order is total: ties break on
    # the bigram itself).
    top = bc.orderBy(
        F.col("c12").desc(), F.col("w1"), F.col("w2")
    ).limit(int(top_n))
    return (
        top.join(left, "w1")
        .join(right, "w2")
        .join(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n1p_w1",
            "cont_w2",
            "types",
            (
                (F.lit(2) * F.col("c12") - F.lit(1)) * F.col("types")
                + F.col("n1p_w1") * F.col("cont_w2")
            ).alias("pkn_num"),
            (F.lit(2) * F.col("c1") * F.col("types")).alias("pkn_den"),
        )
    )
