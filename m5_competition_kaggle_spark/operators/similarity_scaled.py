"""Occupancy-scaled LSH ANN — the 100 TB mode of ``lsh_topk``.

The r4 performance audit flagged ``lsh_topk`` at FIXED ``num_planes`` as
the suite's one super-linear operator: with 4 planes there are only 16
buckets per table, so expected bucket occupancy — and with it the
candidate count per query — grows linearly with the corpus (measured
5.5× work at a 10× corpus). The fix is standard LSH sizing: hold
EXPECTED BUCKET OCCUPANCY constant by scaling the plane count with the
corpus, ``num_planes ≈ log2(N / target_occupancy)``; candidates per
query then stay ≈ ``num_tables · target_occupancy`` regardless of N.

The plane-count rule here is deliberately INTEGER-EXACT (ceil-division
plus bit-length, no float ``log2``) so an external SQL engine reproduces
the identical plane count — and therefore identical buckets and results
— from the same row count. ``x47_sim_topk_lsh_auto`` hash-certifies
this end to end against a DuckDB twin.

This lives in its own module (not ``operators/similarity.py``) for a
certification-window reason: similarity.py sits in the transitive code
hash of 26 currently-banked queries, and editing it in r5 would stale
them out of a window already fully booked by the 45 re-certifications
(see queries/__init__.py). Consolidating ``num_planes=None`` into
``lsh_topk`` itself is queued for the r6 batch of staling edits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from m5_competition_kaggle_spark.operators.similarity import lsh_topk

MAX_PLANES = 20  # 2^20 buckets/table; bucket ids stay well inside int64


def auto_num_planes(
    n_vectors: int,
    target_occupancy: int = 32,
    max_planes: int = MAX_PLANES,
) -> int:
    """Smallest p with 2**p buckets ≥ N / target_occupancy, in [1, max].

    Pure integer arithmetic — ``ceil(N / occ)`` by ceil-division, then
    ``ceil(log2(m))`` as ``(m - 1).bit_length()`` — so any engine (or a
    SQL oracle via a ``(1 << p) >= m`` scan) derives the identical plane
    count from the same count. Occupancy then satisfies
    ``occ/2 < N / 2**p <= occ``: per-table candidates per query are a
    constant band, independent of corpus size.
    """
    if n_vectors < 0:
        raise ValueError(f"n_vectors must be >= 0, got {n_vectors}")
    if target_occupancy <= 0:
        raise ValueError(
            f"target_occupancy must be > 0, got {target_occupancy}"
        )
    m = max(1, -(-n_vectors // target_occupancy))  # ceil div, >= 1
    return min(max_planes, max(1, (m - 1).bit_length()))


def lsh_topk_auto(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int | None = None,
    target_occupancy: int = 32,
    num_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``lsh_topk`` with ``num_planes=None`` → occupancy-scaled planes.

    Pays one extra count() action over the vector side (a column-pruned
    metadata-friendly scan — negligible next to the bucket join it
    right-sizes). Everything downstream is the audited ``lsh_topk``
    plan: (table, bucket) equi-join on 24-byte keys, map-side pair
    dedup, one exact quantized dot per unique pair.

    The 10× probe contract (tests/test_similarity_scaled.py): with auto
    planes the candidate-pair count per query stays in a constant
    occupancy band as the corpus grows, where fixed planes grow it
    linearly — the scale-shape fix for the r4 audit's one weak entry.
    """
    if num_planes is None:
        num_planes = auto_num_planes(vectors.count(), target_occupancy)
    return lsh_topk(
        vectors,
        queries,
        k=k,
        num_planes=num_planes,
        num_tables=num_tables,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
    )
