"""Online near-dup probe (streaming/neardup.py): the live stream's
collision events must equal the batch twin bit-for-bit, with exactly
one stateful operator (the watermarked signature aggregate)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.neardup import (
    corpus_lsh_index,
    near_dup_collisions,
    streaming_near_dup_collisions,
)

SF = "/root/testdata/sf0.001"
EPOCH = 1_700_000_000


def _with_ts(df):
    # Deterministic event time: one doc per second from a fixed epoch.
    return df.withColumn(
        "arrived_at", F.timestamp_seconds(F.lit(EPOCH) + F.col("doc_id"))
    )


def _staged_dir(spark):
    d = tempfile.mkdtemp(prefix="docs_neardup_stream_")
    # Stage only the "arriving" half, with the event-time column baked
    # in so the file-source stream sees exactly the batch frame.
    docs = load_table(spark, SF, "documents")
    _with_ts(docs.filter(F.col("doc_id") % 2 == 1)).coalesce(1) \
        .write.mode("overwrite").parquet(d)
    return d


def test_stream_equals_batch_collisions(spark):
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    arriving = docs.filter(F.col("doc_id") % 2 == 1)
    index = corpus_lsh_index(corpus, "doc_id", "text").persist()

    batch = near_dup_collisions(arriving, index, "doc_id", "text")
    expected = sorted(map(tuple, batch.collect()))
    assert expected  # the fixture corpus contains near-dups

    d = _staged_dir(spark)
    try:
        stream_src = (
            spark.readStream.schema(
                spark.read.parquet(d).schema
            ).parquet(d)
        )
        out = streaming_near_dup_collisions(
            stream_src, index, "doc_id", "text", "arrived_at"
        )
        q = (
            out.writeStream.outputMode("complete")
            .format("memory")
            .queryName("neardup_out")
            .start()
        )
        try:
            q.processAllAvailable()
            got = sorted(map(
                tuple,
                spark.sql("SELECT * FROM neardup_out").collect()))
        finally:
            q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got == expected


def test_exactly_one_stateful_operator(spark):
    """The probe join must stay stateless (stream-static): only the
    signature aggregate holds state."""
    docs = load_table(spark, SF, "documents")
    index = corpus_lsh_index(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text")
    d = _staged_dir(spark)
    try:
        stream_src = spark.readStream.schema(
            spark.read.parquet(d).schema).parquet(d)
        out = streaming_near_dup_collisions(
            stream_src, index, "doc_id", "text", "arrived_at")
        plan = out._jdf.queryExecution().analyzed().toString()
        assert plan.count("Aggregate") >= 1
        # stream-stream joins would appear as a join of two streaming
        # relations; the static side here is a LocalRelation/LogicalRDD.
        assert "StreamingRelation" in plan
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_empty_stream_side_and_empty_corpus(spark):
    docs = load_table(spark, SF, "documents")
    empty = spark.createDataFrame([], "doc_id long, text string")
    idx = corpus_lsh_index(docs.limit(50), "doc_id", "text")
    assert near_dup_collisions(empty, idx, "doc_id", "text").count() == 0
    empty_idx = corpus_lsh_index(empty, "doc_id", "text")
    assert near_dup_collisions(
        docs.limit(50), empty_idx, "doc_id", "text").count() == 0
