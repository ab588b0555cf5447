"""Streaming KS drift trajectory — per-event-time-day numeric drift
against a static trained reference distribution.

The online form of x117's one-shot split KS, and the NUMERIC sibling
of the streaming PSI monitor (`streaming/psi_monitor.py`): each
arriving day's empirical value distribution is compared against the
frozen reference ECDF, so score/latency/price drift surfaces the day
it happens. The plan follows the s17 pattern:

- per-(day, bucket) counts are a tumbling-day streaming
  aggregation — state bounded by the CALENDAR: |days seen| x |value
  buckets| (the stream quantizes at integer granularity, a few
  hundred buckets for the events value range), independent of event
  volume. Complete mode retains every day and applies late rows
  whenever they arrive (the watermark is inert under complete mode);
  an eviction-needing deployment switches to update mode with a
  merging sink (``streaming/update_mode.py``) — where the SINK must
  enforce the lateness cutoff, because Spark's watermark guarantee is
  one-sided (measured on this build: a too-late row re-creates the
  evicted day's state and re-emits a PARTIAL count rather than being
  dropped);
- the KS assembly (reference join + running CDFs + argmax) runs on
  the BOUNDED aggregate per trigger in ``foreachBatch``, through the
  SAME exact-integer kernel (`operators/ksdist.ks_from_cells`) the
  certified batch twin uses — stream == batch is an arithmetic
  identity, not a coincidence.

s18's batch twin certifies the day table against DuckDB;
tests/test_streaming_ks.py proves the file-source stream emits the
identical trajectory, including across multi-file triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.ksdist import ks_from_cells
from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)


def day_bucket_counts(
    events: DataFrame,
    since_nanos: int | None = None,
    value_col: str = "value",
) -> DataFrame:
    """(day, q, c_cmp) tumbling-day counts of the integer-quantized
    value — batch or stream (the identical plan runs incrementally).

    The monitor quantizes at integer granularity (round(value)) so the
    streaming state stays a few hundred buckets per open day; the
    one-shot x117 certificate uses the finer x1000 grid."""
    if since_nanos is not None:
        events = events.filter(
            F.col("ts_nanos") >= F.lit(int(since_nanos))
        )
    return (
        events.groupBy(
            F.window("ts", "1 day").alias("__w"),
            F.expr(
                f"CAST(round({value_col}) AS BIGINT)"
            ).alias("q"),
        )
        .agg(F.count(F.lit(1)).alias("c_cmp"))
        .select(
            F.col("__w.start").cast("date").alias("day"),
            "q",
            "c_cmp",
        )
    )


def ks_day_table(
    day_counts: DataFrame, ref_counts: DataFrame
) -> DataFrame:
    """KS trajectory assembly over the bounded aggregate.

    ``day_counts``: (day, q, c_cmp). ``ref_counts``: (q, c_ref) — the
    frozen reference histogram (broadcast). Buckets seen on only one
    side contribute zero counts on the other (a full ECDF union, so
    mass the reference never saw still widens the gap). Output one
    row per day: day, n_ref, n_cmp, q_at, d_num, d_den, ks_permille
    — `operators/ksdist.ks_from_cells` arithmetic verbatim."""
    ref = F.broadcast(ref_counts.select("q", "c_ref"))
    days = day_counts.select("day").distinct()
    grid = days.crossJoin(ref)
    cells = (
        grid.join(day_counts, ["day", "q"], "full_outer")
        .withColumn("c_ref", F.coalesce("c_ref", F.lit(0)))
        .withColumn("c_cmp", F.coalesce("c_cmp", F.lit(0)))
    )
    return ks_from_cells(cells, ["day"])


def streaming_ks_trajectory(
    spark: SparkSession,
    source_dir: str,
    ref_counts: DataFrame,
    since_nanos: int,
    sink_rows: list,
    checkpoint_dir: str,
    watermark: str = "2 days",
    **source_options,
):
    """Wire the monitor over a real file-source stream: calendar-bounded
    day-bucket counts, KS assembly per trigger in ``foreachBatch``
    (complete mode — the aggregate is calendar-bounded; the
    attached watermark is inert here, see the module docstring — each trigger emits the
    whole refreshed trajectory). Appends the FINAL trigger's rows to
    ``sink_rows``; returns the started query (caller stops it)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    counts = day_bucket_counts(stream, since_nanos=since_nanos)

    def assemble(batch_df: DataFrame, _batch_id: int) -> None:
        snapshot = ks_day_table(batch_df, ref_counts).collect()
        sink_rows.clear()
        sink_rows.extend(snapshot)

    return (
        counts.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(assemble)
        .start()
    )
