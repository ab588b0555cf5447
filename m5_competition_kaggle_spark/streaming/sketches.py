"""Streaming sketch maintenance — CMS cells as a live streaming agg.

Most unwatermarked streaming aggregations are a state-size hazard: the
state grows with the key domain. A Count-Min Sketch inverts that — its
state is BOUNDED at D·W cells by construction no matter how many
distinct items or events flow through, which makes it exactly the kind
of aggregate you can keep continuously up to date over an unbounded
stream with no watermark and no eviction policy. The streaming plan is
the very same ``operators.cms.cms_build`` aggregation running on a
``readStream`` frame (complete/update output); the batch twin over the
same files is bit-identical (s9 certifies the batch side against
DuckDB; tests/test_streaming_sketches.py proves stream == batch).

Point lookups against the live sketch use ``operators.cms.cms_estimate``
on the sink table — the standard serving pattern: stream maintains the
tiny cell table, queries broadcast-join it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.cms import cms_build
from m5_competition_kaggle_spark.streaming.events import read_events_stream


def streaming_cms_cells(
    spark: SparkSession,
    source_dir: str,
    item_col: str = "user_id",
) -> DataFrame:
    """Live (d, pos, cnt) CMS cells over an events file-source stream.

    Run with ``outputMode("complete")`` (the whole ≤ D·W-row sketch per
    trigger) or ``"update"`` (changed cells only — the incremental feed
    for a serving store).
    """
    ev = read_events_stream(spark, source_dir)
    items = ev.select(F.col(item_col).cast("string").alias("__item"))
    return cms_build(items, "__item")


def windowed_cms_cells(
    events: DataFrame,
    item_col: str = "user_id",
    duration: str = "1 hour",
) -> DataFrame:
    """Per-tumbling-window CMS cells (window_start, d, pos, cnt): one
    bounded D·W sketch per event-time window instead of one global one
    — the time-sliced frequency profile (per-hour heavy hitters, drift
    detection between windows via cell-wise comparison). Identical
    expression on batch and streaming frames; in streaming, pair with
    ``withWatermark`` upstream so closed windows' state can age out —
    per-window state is still bounded at D·W cells."""
    items = events.select(
        F.window("ts", duration)["start"].alias("window_start"),
        F.col(item_col).cast("string").alias("__item"),
    )
    return cms_build(items, "__item", ("window_start",))


def streaming_windowed_cms_cells(
    spark: SparkSession,
    source_dir: str,
    item_col: str = "user_id",
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The streaming form of :func:`windowed_cms_cells`, watermarked so
    window state expires once the watermark passes. NOTE: Spark's
    late-data guarantee is one-sided (measured — ARCHITECTURE.md
    erratum): rows within the watermark WILL aggregate, but rows beyond
    it are NOT guaranteed dropped; a sink-side cutoff
    (``streaming/update_mode.py``) is required when exactness matters."""
    ev = read_events_stream(spark, source_dir).withWatermark(
        "ts", watermark
    )
    return windowed_cms_cells(ev, item_col, duration)
