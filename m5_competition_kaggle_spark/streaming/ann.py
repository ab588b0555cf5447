"""Online ANN serving: a stream of query embeddings probing a static
PQ-encoded corpus — the retrieval sibling of s11's dedup-at-ingest.

Third streaming integration style in the engine, alongside the
watermarked stateful aggregate (s11) and the zero-state stream-static
join (s12): **foreachBatch plan reuse**. ADC scoring needs a per-query
aggregate over (query, vector) partial distances, but all of one
query's rows materialize together inside its micro-batch (the explode
happens batch-side), so NO cross-batch state is semantically required
— holding a (queries x corpus) streaming-agg state would grow without
bound for nothing. foreachBatch instead replays the exact BATCH plan
per micro-batch: the static sides (codebook + code table — the tiny
artifacts production precomputes at index build) are captured
DataFrames, re-broadcast each trigger, and stream == batch holds by
construction because it IS the batch plan.

Scale: per trigger the work is |batch queries| x m x k against the
broadcast codebook plus a keyed join on (subspace, code) — identical
to the certified x72 ADC stage; corpus-sized state never exists on the
stream side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ann_top1(
    queries: DataFrame,
    vectors: DataFrame,
    m: int = 16,
    n_codes: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Batch twin (s13): the ADC nearest neighbor per query —
    (query_id, vec_id, est_dist), rank-1 by (est ASC, vec_id ASC),
    query's own vector excluded. Ranking by min(struct) aggregation,
    not a window, precisely so the SAME plan runs under foreachBatch
    without any streaming-unsupported operator."""
    from m5_competition_kaggle_spark.operators.similarity_pq import (
        pq_topk,
    )

    est = pq_topk(vectors, queries, k=None, m=m, n_codes=n_codes,
                  id_col=id_col, vec_col=vec_col, dim=dim)
    # r14: rank-1 as min(est_dist * B + vec_id) with B = max(id) + 1
    # (a broadcast 1-row scalar over the static corpus) — one LongType
    # min, so the aggregate stays on the HASH-aggregate path with
    # map-side partials; min(struct) falls to SortAggregate (the x72
    # encode finding), which sorts the |Q|×|corpus| estimate table.
    # Exact same (est_dist ASC, vec_id ASC) tie-break: ids are
    # non-negative and < B, so packed order ⟺ lexicographic order;
    # ANSI multiply raises loudly if est_dist·B ever left int64.
    bmax = vectors.agg(
        (F.max(F.col(id_col)) + F.lit(1)).alias("__b"))
    best = (
        est.join(F.broadcast(bmax))
        .groupBy("query_id")
        .agg(
            F.min(
                F.col("est_dist") * F.col("__b") + F.col("vec_id")
            ).alias("__p"),
            F.max("__b").alias("__b2"),
        )
    )
    return best.select(
        "query_id",
        F.pmod("__p", F.col("__b2")).alias("vec_id"),
        F.expr("__p div __b2").alias("est_dist"),
    )


def streaming_ann_top1(
    stream_queries: DataFrame,
    vectors: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    writestream_options: dict[str, str] | None = None,
    **kwargs,
):
    """Start a foreachBatch query: every micro-batch of query vectors
    runs the exact batch ADC plan against the static corpus and hands
    the per-query nearest neighbors to ``sink(result_df, batch_id)``.
    Returns the StreamingQuery handle.

    ``checkpoint_dir`` is how production gets restart-without-replay:
    foreachBatch tracks batch offsets in the checkpoint, so a restarted
    query resumes from the last committed micro-batch instead of
    reprocessing the source from scratch (the sink still needs batch_id
    idempotence for exactly-once, as streaming/sinks.py implements).
    ``writestream_options`` passes any further writeStream options
    through verbatim."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(ann_top1(batch_df, vectors, **kwargs), batch_id)

    writer = stream_queries.writeStream.foreachBatch(_process)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    for k, v in (writestream_options or {}).items():
        writer = writer.option(k, v)
    return writer.start()
