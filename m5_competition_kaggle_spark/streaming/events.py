"""Streaming-shaped operators over the ``events`` table.

The reference has no streams (SURVEY §1.1); this is extension surface.
Design rule: every aggregation here is a **plan builder** that accepts
either a batch DataFrame or a ``readStream`` DataFrame — Structured
Streaming's unified model means the same ``groupBy(window(...))`` plan runs
incrementally with state + watermarks on a stream, and as a normal shuffle
agg in batch. Batch mode is what the DuckDB oracle checks; the streaming
smoke test (tests/test_streaming.py) drives the identical plan through a
file-source stream into a memory sink.

Scale notes: watermarks bound state (late rows beyond the delay are
dropped); session windows use Spark's native ``session_window`` state
merging. At 100 TB/day the same plans run on a Kafka source with
``spark.sql.shuffle.partitions`` sized to the sink throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Per-(window, event_type) count + sum over tumbling windows."""
    return (
        events.groupBy(F.window("ts", duration), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding-window count + sum; each event lands in duration/slide
    windows (Spark expands via Expand, no self-union needed)."""
    return (
        events.groupBy(F.window("ts", duration, slide))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def session_aggregate(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows: a session extends while consecutive events
    are ≤ gap apart; only an event strictly LATER than prev + gap starts a
    new session (boundary pinned by tests/test_streaming.py)."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count + value sum in time order — the
    batch equivalent of a keyed streaming accumulator."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("running_n"),
        F.sum("value").over(w).alias("running_value"),
    )


def streaming_tumbling_counts(
    spark, source_dir: str, schema, duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The same tumbling plan on a real file-source stream with a watermark
    bounding state. Returns the streaming DataFrame; callers attach a sink
    (``writeStream``). Late rows beyond ``watermark`` are dropped."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_dir)
    )
    stream = stream.withColumns(
        {
            "ts_nanos": F.col("ts"),
            "ts": F.timestamp_micros(F.expr("ts div 1000")),
        }
    )
    return tumbling_counts(stream.withWatermark("ts", watermark), duration)
