"""Online near-dup detection: a document STREAM probing a static
corpus's MinHash LSH index — dedup-at-ingest.

Batch dedup (x2/x24/x60) asks after the fact; a production ingest
pipeline wants the answer as documents ARRIVE: "does this incoming doc
collide with anything already indexed?" The corpus side is exactly the
artifact production stores anyway — the (key, band, bucket) LSH index
(tiny per doc; recomputing text-side shingles never happens at probe
time). The stream side recomputes nothing but its own signatures:

- shingle + hash: stateless row transforms (explode, md5);
- per-doc minhash signature: ONE windowed streaming aggregate keyed by
  (event-time window, doc id) under a watermark — signature state ages
  out with the watermark, so state is bounded by arrival rate x
  watermark horizon, not corpus size;
- band buckets: stateless unpivot of the agg output (append mode
  emits each doc's signature exactly once, when its window closes);
- probe: a stream-static equi-join on (band, bucket) against the
  index — Spark re-plans the static side per micro-batch; at 100 TB
  the index is bucketed/partitioned on (band, bucket) so the probe is
  a co-located join, and hot buckets fall to AQE skew handling.

Output is the COLLISION EVENT stream (doc_id, corpus_id, band) —
deliberately not aggregated further: downstream consumers (quarantine
queue, exact-verify stage like x60's) choose their own consolidation,
and keeping the tail stateless means exactly one stateful operator in
the whole pipeline. Signatures are side-independent (same h64 /
permutation arithmetic as ``operators/dedup.py``), so the stream
produces bit-for-bit the batch twin's collisions (tested); the batch
twin is oracle-certified (s11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.dedup import (
    doc_shingles,
    minhash_band_buckets,
)
from m5_competition_kaggle_spark.operators.dedup_incremental import (
    _signatures,
)


def corpus_lsh_index(
    corpus_df: DataFrame,
    key_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """The static probe target: (key, band, bucket) for every corpus
    doc — what production computes once at ingest and stores."""
    sh = doc_shingles(corpus_df, key_col, text_col, shingle_size)
    return minhash_band_buckets(
        _signatures(sh, key_col, num_hashes), key_col, num_hashes, bands
    )


def _collisions(
    buckets: DataFrame, index: DataFrame, key_col: str
) -> DataFrame:
    probe = buckets.select(
        F.col(key_col).alias("doc_id"), "band", "bucket")
    idx = index.select(
        F.col(key_col).alias("corpus_id"), "band", "bucket")
    return probe.join(idx, ["band", "bucket"]).select(
        "doc_id", "corpus_id", "band")


def near_dup_collisions(
    new_df: DataFrame,
    index: DataFrame,
    key_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """Batch twin: every (doc_id, corpus_id, band) LSH collision of
    ``new_df`` against the prebuilt corpus ``index``."""
    sh = doc_shingles(new_df, key_col, text_col, shingle_size)
    buckets = minhash_band_buckets(
        _signatures(sh, key_col, num_hashes), key_col, num_hashes, bands
    )
    return _collisions(buckets, index, key_col)


def streaming_near_dup_collisions(
    stream_df: DataFrame,
    index: DataFrame,
    key_col: str,
    text_col: str,
    ts_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """The live path: same arithmetic over a streaming frame.

    ``stream_df`` must carry an event-time column ``ts_col``. The
    signature aggregate is keyed by (window(ts), key) under the
    watermark, so its state is bounded and append mode emits each
    doc exactly once when its window closes.
    """
    from m5_competition_kaggle_spark.functions.text import h64, tokens
    from m5_competition_kaggle_spark.operators.dedup import (
        MINHASH_P,
        minhash_params,
        shingles_expr,
    )

    sh = (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("__toks", tokens(text_col))
        .select(
            F.col(key_col), F.col(ts_col),
            F.explode(
                F.array_distinct(shingles_expr("__toks", shingle_size))
            ).alias("shingle"),
        )
    )

    aggs = [
        F.min(
            (F.lit(a) * F.col("__h") + F.lit(b)) % MINHASH_P
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    sig = (
        sh.withColumn("__h", h64(F.col("shingle")) % MINHASH_P)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(*aggs)
        .drop("window")
    )
    buckets = minhash_band_buckets(sig, key_col, num_hashes, bands)
    return _collisions(buckets, index, key_col)
