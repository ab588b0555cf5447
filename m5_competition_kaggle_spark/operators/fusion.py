"""Reciprocal-rank fusion — combining heterogeneous rankings.

The standard hybrid-retrieval merge (Cormack et al., RRF): given K
rankings of items per query key, score each (key, item) by
``Σ_r 1/(k + rank_r)`` and re-rank. RRF needs no score calibration
across systems — only ranks — which is exactly why production RAG
stacks use it to merge lexical (BM25, x63) and dense (ANN, x9/x72)
retrieval.

Integer contract: each contribution is ``scale DIV (k + rank)`` (both
positive, truncating division identical in Spark and ANSI SQL), so the
fused scores are int64 and the merged ranking certifies bit-for-bit
(x86). An absent item in one ranking simply contributes 0 — the
outer-union semantics fall out of union + groupBy-sum.

Cost shape: a union of the (already small — top-k per key) ranking
tables, one keyed groupBy-sum, one per-key window for the fused rank.
The corpus is never touched; cost is O(Σ ranking rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: Sequence[DataFrame],
    key_col: str,
    item_col: str,
    rank_col: str,
    k: int = 60,
    scale: int = 1_000_000,
    top_n: int | None = None,
) -> DataFrame:
    """Fuse rankings into (key, item, rrf, fused_rank).

    Each input frame must carry (key_col, item_col, rank_col) with
    1-based ranks. fused_rank orders by (rrf DESC, item ASC) —
    deterministic under ties; ``top_n`` keeps the best n per key.
    """
    contribs = [
        r.select(
            F.col(key_col),
            F.col(item_col),
            F.expr(f"{int(scale)} DIV ({int(k)} + {rank_col})")
            .cast("long")
            .alias("__c"),
        )
        for r in rankings
    ]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    fused = unioned.groupBy(key_col, item_col).agg(
        F.sum("__c").alias("rrf")
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("rrf").desc(), F.col(item_col)
    )
    out = fused.withColumn("fused_rank", F.row_number().over(w))
    if top_n is not None:
        out = out.filter(F.col("fused_rank") <= int(top_n))
    return out
