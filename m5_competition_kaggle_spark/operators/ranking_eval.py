"""Graded ranking evaluation — nDCG@k with literal discounts.

Recall@k (x116) counts set overlap; nDCG grades WHICH neighbors came
back and where. Relevance must be GRADED here, not binary: an
approximate index ranked by the same exact score always places its
hits above its non-hits, so binary-gain nDCG of a dot-ordered subset
is identically 1 — vacuous. With gain = k+1-exact_rank (the true #1
neighbor is worth k, the #k-th worth 1, misses 0), losing the top
neighbor costs visibly more than losing the tail, which is exactly
what a production ANN tuning loop cares about beyond recall.

The determinism trick: the position discounts 1/log2(i+1) and the
ideal-DCG ladder are COMPILE-TIME Python floats embedded as
round-trip decimal literals in BOTH engines (the h64_py
derive-constants precedent), so each query's DCG is a fixed-shape
dot product of small integer gains with constants — no
transcendental is ever evaluated inside either engine, and the sum
order is the expression order, not an aggregation order.

Scale design: one keyed join marks gains, one pivot-by-rank
aggregation collapses each query to a single row, and the arithmetic
is columnar. Work is |Q|·k.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def discounts(k: int) -> list[float]:
    """The nDCG position discounts 1/log2(i+1), i = 1..k — derived
    once driver-side; ``repr`` of these floats round-trips bit-exact
    through both engines' decimal parsers."""
    return [1.0 / math.log2(i + 1) for i in range(1, k + 1)]


def ideal_dcg_ladder(k: int) -> list[float]:
    """ideal_dcg_ladder(k)[m-1] = DCG of the ideal ranking when the
    query has m graded-relevant items (grades k..k-m+1 in order)."""
    d = discounts(k)
    out, cum = [], 0.0
    for m in range(1, k + 1):
        cum += (k + 1 - m) * d[m - 1]
        out.append(cum)
    return out


def ndcg_at_k(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int,
) -> DataFrame:
    """Graded nDCG@k of ``ranked`` (query_id, neighbor_id, rank —
    ranks 1..k) against ``relevant`` (query_id, neighbor_id,
    exact_rank — the true ranking, ranks 1..k).

    Output per query: n_rel (graded universe size), n_hit, dcg, idcg
    (doubles built from literal constants) and ndcg_ppm =
    round(1e6·dcg/idcg). Rows come from the RELEVANCE side, so a
    query whose index returned nothing still surfaces — with
    n_hit 0, dcg 0 and ndcg_ppm 0 — instead of silently vanishing
    from the average; queries with an empty relevance set surface
    with NULL ndcg_ppm only when present in ``ranked``."""
    d = discounts(k)
    ladder = ideal_dcg_ladder(k)
    rel = relevant.select(
        "query_id",
        "neighbor_id",
        (F.lit(k + 1) - F.col("exact_rank")).alias("__gain"),
    )
    marked = (
        ranked.filter(F.col("rank") <= k)
        .join(rel, ["query_id", "neighbor_id"], "left")
        .withColumn("__g", F.coalesce("__gain", F.lit(0)))
    )
    per_q = marked.groupBy("query_id").agg(
        *[
            F.sum(
                F.when(F.col("rank") == i + 1, F.col("__g"))
                .otherwise(0)
            )
            .cast("long")
            .alias(f"__g{i + 1}")
            for i in range(k)
        ],
        F.sum(
            F.when(F.col("__g") > 0, 1).otherwise(0)
        ).cast("long").alias("n_hit"),
    )
    n_rel = relevant.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    dcg = None
    for i in range(k):
        term = F.col(f"__g{i + 1}") * F.lit(d[i])
        dcg = term if dcg is None else dcg + term
    idcg = F.lit(None).cast("double")
    for m in range(1, k + 1):
        idcg = F.when(
            F.col("n_rel") == m, F.lit(ladder[m - 1])
        ).otherwise(idcg)
    out = (
        # no broadcast hint: Spark cannot build either side of a
        # full-outer join as a hash-broadcast (HintErrorLogger warns
        # and falls back); both sides are |Q|-row aggregates so the
        # sort-merge exchange is trivial.
        per_q.join(n_rel, "query_id", "full_outer")
        .withColumn("n_rel", F.coalesce("n_rel", F.lit(0)))
        .na.fill(
            0,
            [f"__g{i + 1}" for i in range(k)] + ["n_hit"],
        )
        .withColumn("dcg", dcg)
        .withColumn("idcg", idcg)
        .withColumn(
            "ndcg_ppm",
            F.when(
                F.col("n_rel") > 0,
                F.round(
                    F.lit(1e6) * F.col("dcg") / F.col("idcg")
                ).cast("long"),
            ),
        )
    )
    return out.select(
        "query_id", "n_rel", "n_hit", "dcg", "idcg", "ndcg_ppm"
    )
