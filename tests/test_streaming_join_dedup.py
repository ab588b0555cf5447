"""Structured Streaming twins of s6 (dedup) and s7 (funnel join): the
same logical shapes driven through a real file-source stream into a
memory sink, compared against the batch plans the DuckDB oracle checks."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import SCHEMAS, load_table
from m5_competition_kaggle_spark.streaming.events import (
    funnel_join,
    streaming_funnel_join,
)

SF = "/root/testdata/sf0.001"


def _stage_stream_dir():
    src_dir = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{SF}/events.parquet", os.path.join(src_dir, "part-0.parquet"))
    return src_dir


def test_streaming_funnel_join_matches_batch(spark):
    batch = funnel_join(load_table(spark, SF, "events"))
    expected = {
        (r["user_id"], r["first_id"], r["next_id"]) for r in batch.collect()
    }
    stream = streaming_funnel_join(
        spark, _stage_stream_dir(),
        horizon="1 hour", watermark="2 hours",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["first_user"], r["first_id"], r["next_id"])
            for r in spark.sql("SELECT * FROM funnel_out").collect()
        }
    finally:
        q.stop()
    assert got == expected
    assert got, "funnel join returned no rows at sf0.001"


def test_streaming_drop_duplicates_within_watermark(spark):
    """Streaming dropDuplicates on (user, type, window) keeps exactly one
    row per key — the streaming execution of the s6 shape (streaming keeps
    first-arrival; the batch twin pins event-time-first, so compare KEY
    SETS, not chosen rows)."""
    from m5_competition_kaggle_spark.streaming.events import (
        read_events_stream,
    )

    src_dir = _stage_stream_dir()
    stream = read_events_stream(spark, src_dir)
    deduped = (
        stream.withWatermark("ts", "2 hours")
        .withColumn("window_start", F.window("ts", "1 hour")["start"])
        .dropDuplicates(["user_id", "event_type", "window_start"])
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT user_id, event_type, window_start, count(*) AS n "
            "FROM dedup_out GROUP BY 1, 2, 3"
        ).collect()
    finally:
        q.stop()
    batch_keys = {
        (r["user_id"], r["event_type"], r["window_start"])
        for r in load_table(spark, SF, "events")
        .withColumn("window_start", F.window("ts", "1 hour")["start"])
        .select("user_id", "event_type", "window_start")
        .distinct()
        .collect()
    }
    assert {(r["user_id"], r["event_type"], r["window_start"]) for r in got} == batch_keys
    assert all(r["n"] == 1 for r in got)
