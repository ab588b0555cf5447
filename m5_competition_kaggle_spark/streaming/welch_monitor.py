"""Streaming A/B trajectory — per-event-time-day Welch t² per metric.

The online form of the one-shot x120 readout: an experiment dashboard
does not wait for the window to close, it watches the day-by-day effect
size as data arrives. Follows the s17/s18 monitor pattern:

- per-(day, group) ARM SUFFICIENT STATISTICS (n, Σq, Σq² per arm) are
  a tumbling-day streaming aggregation — six int64 sums per (day,
  group) cell, so state is bounded by the CALENDAR (days seen ×
  groups), independent of event volume. Complete mode retains every
  day's cells and applies late rows whenever they arrive (the
  watermark is inert under complete mode — Spark semantics); a
  deployment that must evict closed days switches to update mode
  with a merging store (``streaming/update_mode.py``) — the watermark
  then bounds state at |open days|, but the SINK must enforce the
  lateness cutoff itself (measured: Spark re-aggregates a too-late
  row into a re-created day and re-emits a partial total rather than
  dropping it);
- the t² assembly runs on the BOUNDED aggregate per trigger in
  ``foreachBatch`` through the SAME fixed-shape arithmetic expression
  (`operators/abtest.welch_from_stats`) the certified batch twin uses,
  so stream == batch is an arithmetic identity.

s19's batch twin certifies the day table against DuckDB;
tests/test_streaming_welch.py proves the file-source stream emits the
identical trajectory, including across multi-file triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.abtest import (
    welch_from_stats,
)
from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)


def day_arm_stats(
    events: DataFrame,
    group_col: str = "event_type",
    arm_expr: str = "user_id % 2",
    q_expr: str = "CAST(round(value * 1000) AS BIGINT)",
) -> DataFrame:
    """(day, group, n_a..ss_b) tumbling-day arm sufficient statistics
    — batch or stream (the identical plan runs incrementally). The
    conditional sums are inlined (not a post-agg join) so the
    streaming state is exactly six int64s per cell."""
    arm = F.expr(arm_expr)
    q = F.expr(q_expr)
    is_a, is_b = arm == 0, arm == 1
    return (
        events.filter(is_a | is_b)
        .groupBy(
            F.window("ts", "1 day").alias("__w"),
            F.col(group_col),
        )
        .agg(
            F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(is_b, 1).otherwise(0)).alias("n_b"),
            F.sum(F.when(is_a, q).otherwise(0)).alias("sum_a"),
            F.sum(F.when(is_b, q).otherwise(0)).alias("sum_b"),
            F.sum(F.when(is_a, q * q).otherwise(0)).alias("ss_a"),
            F.sum(F.when(is_b, q * q).otherwise(0)).alias("ss_b"),
        )
        .select(
            F.col("__w.start").cast("date").alias("day"),
            group_col,
            "n_a", "n_b", "sum_a", "sum_b", "ss_a", "ss_b",
        )
    )


def welch_day_table(day_stats: DataFrame) -> DataFrame:
    """t² trajectory assembly over the bounded aggregate — the shared
    `welch_from_stats` kernel verbatim."""
    return welch_from_stats(day_stats)


def streaming_welch_trajectory(
    spark: SparkSession,
    source_dir: str,
    sink_rows: list,
    checkpoint_dir: str,
    group_col: str = "event_type",
    watermark: str = "2 days",
    **source_options,
):
    """Wire the monitor over a real file-source stream: calendar-bounded
    day-arm sufficient stats, t² assembly per trigger in
    ``foreachBatch`` (complete mode — the aggregate is calendar-bounded; the
    attached watermark is inert here, see the module docstring — each
    trigger emits the whole refreshed trajectory). Appends the FINAL
    trigger's rows to ``sink_rows``; returns the started query
    (caller stops it)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    stats = day_arm_stats(stream, group_col=group_col)

    def assemble(batch_df: DataFrame, _batch_id: int) -> None:
        snapshot = welch_day_table(batch_df).collect()
        sink_rows.clear()
        sink_rows.extend(snapshot)

    return (
        stats.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(assemble)
        .start()
    )
