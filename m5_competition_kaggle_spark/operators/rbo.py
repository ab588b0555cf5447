"""Rank-biased overlap (Webber et al., TOIS 2010) between two keyed
rankings — the top-weighted ranking-similarity metric that completes
the ANN evaluation family: recall@k (x116) counts set hits, nDCG
(x131) grades one ranking against truth, RBO compares two RANKINGS
head-weighted, which is what "did the IVF index change the ordering
users actually see?" asks.

Truncated prefix form at depth d with persistence p = 9/10:

    RBO_d = (1−p) · Σ_{k=1..d} p^(k−1) · |A_k ∩ B_k| / k

All-integer certification: a matched doc at ranks (ra, rb) joins the
overlap for every k >= m = max(ra, rb), so its total contribution is
W(m) = Σ_{k=m..d} p^(k−1)/k — with p = 9/10 and d = 10 an exact
rational over the constant denominator D = 2520·10^9 (2520 =
lcm(1..10)). Each doc contributes the exact int64 W_num(m); a
per-query RBO numerator is one keyed sum (max ~5·10^12, far inside
int64), and rbo_ppm = 10^6·(1−p)·num/D = num DIV 2_520_000 · adjusted
— emitted as an exact integer quotient. No doubles anywhere.

Scale: one keyed equi-join of the two (query, doc, rank) tables plus
one keyed aggregate; the weight map is a 10-case literal expression
(JVM-side), never a UDF or a collected table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# W_num(m) = Σ_{k=m..10} 9^(k-1) · 10^(10-k) · (2520 / k) over the
# constant denominator D = 2520 · 10^9 (exact; computed once here,
# mirrored literally in the DuckDB oracles)
_D = 2520 * 10**9
_W_NUM = {
    m: sum(9 ** (k - 1) * 10 ** (10 - k) * (2520 // k) for k in range(m, 11))
    for m in range(1, 11)
}
RBO_DEPTH = 10
RBO_DENOM = _D


def _w_num_expr(m_col: str) -> F.Column:
    out = None
    for m, num in _W_NUM.items():
        cond = F.col(m_col) == m
        out = (
            F.when(cond, F.lit(num))
            if out is None
            else out.when(cond, F.lit(num))
        )
    return out.otherwise(F.lit(0)).cast("long")


def rbo_prefix(
    ranking_a: DataFrame,
    ranking_b: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str,
) -> DataFrame:
    """Truncated RBO (p=9/10, d=10) per query between two rankings
    given as (query, doc, rank<=10) tables. Output per query:
    n_matched (docs in both prefixes), rbo_num (exact numerator over
    RBO_DENOM), rbo_ppm = 10^6·(1−p)·Σ — the comparable score."""
    a = ranking_a.select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rank_col).cast("long").alias("ra"),
    ).filter(F.col("ra") <= RBO_DEPTH)
    b = ranking_b.select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rank_col).cast("long").alias("rb"),
    ).filter(F.col("rb") <= RBO_DEPTH)
    matched = a.join(b, on=["q", "d"], how="inner").withColumn(
        "__m", F.greatest("ra", "rb")
    )
    per_q = matched.groupBy("q").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum(_w_num_expr("__m")).alias("rbo_num"),
    )
    # rbo_ppm = 1e6 · (1/10) · rbo_num / (2520·10^9)
    #         = rbo_num DIV 25_200_000 (exact integer arithmetic)
    return per_q.select(
        F.col("q").alias(query_col),
        "n_matched",
        "rbo_num",
        F.expr("rbo_num DIV 25200000").alias("rbo_ppm"),
    )
