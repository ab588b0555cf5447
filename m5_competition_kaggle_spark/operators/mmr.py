"""Maximal Marginal Relevance — integer-exact diversified top-k.

The retrieval re-ranker that trades pure relevance for coverage: from a
per-query candidate shortlist, greedily pick the item maximizing

    MMR = lam * rel(q, i)  -  (1 - lam) * max_{s in selected} sim(i, s)

so near-duplicate neighbors stop crowding the result — the selection
half of the dedup story (x1-x4 remove duplicates from the corpus; MMR
keeps them OUT of a retrieved context window). With lam the rational
lam_num/lam_den and rel/sim both quantized int64 dots (the QUANT
precedent), the scaled score

    mmr2 = lam_num * rel - (lam_den - lam_num) * max_sim

is exact integer arithmetic; ties break on neighbor_id, so the greedy
trajectory is fully deterministic and hash-certifies against an
unrolled SQL twin.

Scale design: the quadratic part is confined to each query's SHORTLIST
(k_short items from the ANN stack — x9/x10/x23's output), never the
corpus: one keyed join attaches quantized vectors to shortlist rows,
then an Arrow-batched cogrouped pass runs the greedy loop on k_short
x k_short int64 matrices per query. Work is |Q| * k_short^2 with
k_short a constant — linear in queries, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.similarity import (
    quantize_expr,
)

_OUT_SCHEMA = (
    "query_id long, mmr_rank int, neighbor_id long, "
    "rel long, max_sim long, mmr2 long"
)


def mmr_rerank(
    shortlist: DataFrame,
    vectors: DataFrame,
    k: int = 3,
    lam_num: int = 1,
    lam_den: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR selection of ``k`` items per query from
    ``shortlist`` (columns: query_id, neighbor_id, dot — the
    relevance, e.g. ``brute_force_topk`` output), with pairwise
    similarity computed on ``vectors``' quantized embeddings.

    Output per query: mmr_rank 1..k (fewer when the shortlist is
    smaller), neighbor_id, rel, max_sim (0 for the first pick) and
    mmr2 = lam_num*rel - (lam_den-lam_num)*max_sim.
    """
    if not (0 < lam_num <= lam_den):
        raise ValueError("need 0 < lam_num <= lam_den")
    import numpy as np
    import pandas as pd

    vq = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_expr(vec_col).alias("__vq"),
    )
    rows = shortlist.select(
        "query_id", "neighbor_id", F.col("dot").alias("rel")
    ).join(vq, "neighbor_id")

    kk, ln, lc = int(k), int(lam_num), int(lam_den - lam_num)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        vmat = np.array(pdf["__vq"].tolist(), dtype=np.int64)
        sims = vmat @ vmat.T
        rel = pdf["rel"].to_numpy(dtype=np.int64)
        nid = pdf["neighbor_id"].to_numpy(dtype=np.int64)
        taken: list[int] = []
        out = []
        for r in range(1, min(kk, len(pdf)) + 1):
            if taken:
                max_sim = sims[:, taken].max(axis=1)
            else:
                max_sim = np.zeros(len(pdf), dtype=np.int64)
            score = ln * rel - lc * max_sim
            score[taken] = np.iinfo(np.int64).min
            # argmax by (score desc, neighbor_id asc): nid is sorted
            # ascending, so the first occurrence of the max wins ties.
            pick = int(np.argmax(score))
            out.append(
                (
                    int(pdf["query_id"].iloc[0]), r, int(nid[pick]),
                    int(rel[pick]), int(max_sim[pick]),
                    int(score[pick]),
                )
            )
            taken.append(pick)
        return pd.DataFrame(
            out,
            columns=[
                "query_id", "mmr_rank", "neighbor_id",
                "rel", "max_sim", "mmr2",
            ],
        )

    return rows.groupBy("query_id").applyInPandas(greedy, _OUT_SCHEMA)
