"""Streaming-shaped operators over the ``events`` table.

The reference has no streams (SURVEY §1.1); this is extension surface.
Design rule: every aggregation here is a **plan builder** that accepts
either a batch DataFrame or a ``readStream`` DataFrame — Structured
Streaming's unified model means the same ``groupBy(window(...))`` plan runs
incrementally with state + watermarks on a stream, and as a normal shuffle
agg in batch. Batch mode is what the DuckDB oracle checks; the streaming
smoke test (tests/test_streaming.py) drives the identical plan through a
file-source stream into a memory sink.

Scale notes: watermarks bound state — rows within the watermark WILL
aggregate, but Spark's late-data guarantee is one-sided (measured —
ARCHITECTURE.md erratum): rows beyond it are NOT guaranteed dropped, so
a sink-side cutoff (``streaming/update_mode.py``) is required when
exactness matters. Session windows use Spark's native
``session_window`` state merging. At 100 TB/day the same plans run on a Kafka source with
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


def read_events_stream(spark, source_dir: str, **options) -> DataFrame:
    """File-source stream of staged events parquet, normalized to the
    catalog's logical events schema (ts timestamp + ts_nanos long). The
    physical ts type is footer-sniffed from the staged files, so both
    generator formats (epoch-nanos long / TIMESTAMP-MICROS) work; an
    empty directory falls back to the micros/NTZ default schema so the
    stream can start before data lands.

    CHECKPOINT COMPATIBILITY: the source projection changed when footer
    sniffing + normalization replaced the fixed raw-long schema — a
    restart against a checkpoint written by the old plan shape will fail
    or misbehave. Use a fresh checkpoint dir for queries built on this
    version (suggested convention: suffix ``-v2``)."""
    from m5_competition_kaggle_spark.sources.catalog import (
        events_raw_schema,
        normalize_events,
    )

    raw = events_raw_schema(spark, source_dir)
    reader = spark.readStream.schema(raw).format("parquet")
    for k, v in options.items():
        reader = reader.option(k, v)
    return normalize_events(reader.load(source_dir))


def streaming_tumbling_counts(
    spark, source_dir: str, duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The same tumbling plan on a real file-source stream with a watermark
    bounding state. Returns the streaming DataFrame; callers attach a sink
    (``writeStream``). Rows within ``watermark`` WILL aggregate; rows
    beyond it are NOT guaranteed dropped (one-sided guarantee, measured —
    ARCHITECTURE.md erratum) — use the ``streaming/update_mode.py``
    sink-side cutoff when exactness matters."""
    stream = read_events_stream(spark, source_dir)
    return tumbling_counts(stream.withWatermark("ts", watermark), duration)


def first_event_per_window(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    duration: str = "1 hour",
) -> DataFrame:
    """Event-time deduplication: the FIRST event per key per tumbling
    window. Batch twin of streaming ``dropDuplicates([*keys, window])``
    under a watermark — with the difference that streaming keeps the first
    *arrival* while this keeps the event-time first (deterministic, what
    the oracle can check). One shuffle on (keys, window); state in the
    streaming run is bounded by the watermark horizon × key cardinality.
    """
    from pyspark.sql.window import Window

    out = events.withColumn(
        "window_start", F.window("ts", duration)["start"]
    )
    w = Window.partitionBy(*keys, "window_start").orderBy(
        "ts_nanos", "event_id"
    )
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*keys, "window_start", "event_id", "ts", "value")
    )


def funnel_join(
    events: DataFrame,
    first_type: str = "view",
    next_type: str = "purchase",
    horizon_us: int = 3_600_000_000,
) -> DataFrame:
    """Funnel/attribution interval join: for every ``first_type`` event,
    the same user's ``next_type`` events within ``horizon_us`` after it.

    The stream-stream-join shape (Structured Streaming runs the identical
    plan with watermarks + the time-range condition bounding both state
    stores; see ``streaming_funnel_join``). Scale: the join key is the
    EQUI pair (user_id) so the shuffle co-locates by user; the range
    predicate only filters within a user's partition — never a cross
    product across users. Comparisons use MICROsecond longs: integer-exact
    cross-engine parity at the precision every engine retains (DuckDB
    truncates the parquet TIMESTAMP_NS column to micros on read).
    """
    a = events.filter(F.col("event_type") == first_type).select(
        "user_id",
        F.col("event_id").alias("first_id"),
        F.expr("ts_nanos div 1000").alias("first_us"),
    )
    b = events.filter(F.col("event_type") == next_type).select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_id").alias("next_id"),
        F.expr("ts_nanos div 1000").alias("next_us"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_id_b"))
            & (F.col("next_us") >= F.col("first_us"))
            & (F.col("next_us") <= F.col("first_us") + F.lit(horizon_us)),
        )
        .select(
            "user_id",
            "first_id",
            "next_id",
            (F.col("next_us") - F.col("first_us")).alias("delay_us"),
        )
    )


def enrich_with_static(
    events: DataFrame, dim: DataFrame, on: str = "event_type"
) -> DataFrame:
    """Stream-static enrichment join: attach a (small) static dimension
    to every event. On a stream, Spark re-evaluates the static side per
    micro-batch and broadcasts it — no stream state at all, the cheapest
    join Structured Streaming has. The identical plan runs in batch
    (what the s8 oracle checks). Left join: events with an unknown key
    pass through with NULL attributes rather than being dropped."""
    return events.join(F.broadcast(dim), on, "left")


def streaming_funnel_join(
    spark, source_dir: str,
    first_type: str = "view", next_type: str = "purchase",
    horizon: str = "1 hour", watermark: str = "2 hours",
) -> DataFrame:
    """Real stream-stream inner join with event-time range bounds: both
    sides watermarked, the join condition's time range lets Spark expire
    per-side state. Returns the streaming DataFrame for a caller's sink."""
    def side(tp, pfx):
        s = read_events_stream(spark, source_dir)
        s = s.filter(F.col("event_type") == tp)
        return s.select(
            F.col("user_id").alias(f"{pfx}_user"),
            F.col("event_id").alias(f"{pfx}_id"),
            F.col("ts").alias(f"{pfx}_ts"),
        ).withWatermark(f"{pfx}_ts", watermark)

    a, b = side(first_type, "first"), side(next_type, "next")
    return a.join(
        b,
        (F.col("first_user") == F.col("next_user"))
        & (F.col("next_ts") >= F.col("first_ts"))
        & (F.col("next_ts") <= F.col("first_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("first_user", "first_id", "next_id", "first_ts", "next_ts")
