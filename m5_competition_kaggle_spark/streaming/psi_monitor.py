"""Streaming PSI drift trajectory — per-event-time-day population
stability against a static trained reference.

The online form of x114's one-shot split PSI: production drift
monitoring doesn't ask "did the whole comparison window drift" once,
it tracks the PSI of EACH arriving period against the frozen training
distribution so a feed regression shows up the day it happens. The
plan is Spark-first twice over:

- the per-(day, category) counts are a WATERMARKED tumbling-window
  aggregation — state bounded at |open windows| x |categories|, late
  state bounded by the calendar (days seen x categories; the
  watermark is inert under complete mode — late rows land in their
  day whenever they arrive; see ``streaming/update_mode.py`` for the
  eviction variant, where the SINK enforces the lateness cutoff —
  Spark does not guarantee the drop);
- the PSI assembly (reference join + per-day totals + term) runs on
  the BOUNDED aggregate only, never on raw events — in batch as plain
  window functions, per trigger inside ``foreachBatch`` in streaming
  (the s13 pattern: a tiny static-joined post-stage over a streaming
  agg that streaming-mode window functions cannot express).

Both modes share ``day_category_counts`` (Structured Streaming's
unified model: the identical plan runs incrementally on a stream) and
``operators.psi.psi_term_col`` (the certified expression tree), so
s17's batch twin certifies against DuckDB while
tests/test_streaming_psi.py proves the file-source stream emits the
same trajectory bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.psi import psi_term_col
from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)


def day_category_counts(
    events: DataFrame,
    cat_col: str = "event_type",
    since_nanos: int | None = None,
) -> DataFrame:
    """(day, cat, c_cmp) tumbling-day counts — batch or stream.

    ``since_nanos`` pre-filters to the monitored window (pushed to the
    scan in batch; applied per-row in streaming). The day bucket is
    the UTC tumbling window start date, identical in both modes."""
    if since_nanos is not None:
        events = events.filter(
            F.col("ts_nanos") >= F.lit(int(since_nanos))
        )
    return (
        events.groupBy(
            F.window("ts", "1 day").alias("__w"),
            F.col(cat_col).alias("cat"),
        )
        .agg(F.count(F.lit(1)).alias("c_cmp"))
        .select(
            F.col("__w.start").cast("date").alias("day"),
            "cat",
            "c_cmp",
        )
    )


def psi_day_table(
    day_counts: DataFrame, ref_counts: DataFrame
) -> DataFrame:
    """PSI trajectory assembly over the bounded aggregate.

    ``day_counts``: (day, cat, c_cmp). ``ref_counts``: (cat, c_ref) —
    the frozen reference distribution (broadcast). Output per (day,
    cat): counts, the constant n_ref, that day's n_cmp and the
    psi_term; categories in the reference but absent that day surface
    with c_cmp = 0 and a NULL term (never smoothed). Summing non-NULL
    terms within a day gives that day's PSI."""
    ref = F.broadcast(ref_counts.select("cat", "c_ref"))
    days = day_counts.select("day").distinct()
    # reference categories must appear for EVERY monitored day, even
    # at zero observed count — a vanished category IS the drift signal
    # cat joins null-safely (mirroring psi_from_counts): a NULL
    # category in the comparison stream must MATCH a NULL reference
    # category, not split into two half-rows that double-count its
    # mass in n_cmp. day is a window start, never NULL.
    grid = days.crossJoin(ref).select(
        F.col("day").alias("__gday"),
        F.col("cat").alias("__gcat"),
        "c_ref",
    )
    joined = grid.join(
        day_counts,
        (F.col("__gday") == F.col("day"))
        & F.col("__gcat").eqNullSafe(F.col("cat")),
        "full_outer",
    ).select(
        F.coalesce("__gday", "day").alias("day"),
        F.when(F.col("__gday").isNotNull(), F.col("__gcat"))
        .otherwise(F.col("cat"))
        .alias("cat"),
        F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
        F.coalesce("c_cmp", F.lit(0)).alias("c_cmp"),
    )
    n_ref = ref_counts.agg(
        F.sum("c_ref").cast("long").alias("n_ref")
    )
    w_day = Window.partitionBy("day")
    return (
        joined.crossJoin(F.broadcast(n_ref))
        .withColumn("n_cmp", F.sum("c_cmp").over(w_day))
        .withColumn(
            "psi_term",
            psi_term_col(
                F.col("c_ref"), F.col("c_cmp"),
                F.col("n_ref"), F.col("n_cmp"),
            ),
        )
        .select(
            "day", "cat", "c_ref", "c_cmp", "n_ref", "n_cmp",
            "psi_term",
        )
    )


def streaming_psi_trajectory(
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
    day-window counts, PSI assembly per trigger in ``foreachBatch``
    (complete mode — the aggregate is calendar-bounded; the
    attached watermark is inert here, see the module docstring — each trigger emits the
    whole refreshed trajectory). Appends the FINAL trigger's rows to
    ``sink_rows``; returns the started query (caller stops it).
    ``source_options`` pass through to the file source (e.g.
    ``maxFilesPerTrigger=1`` to force multi-trigger consumption)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    counts = day_category_counts(stream, since_nanos=since_nanos)

    def assemble(batch_df: DataFrame, _batch_id: int) -> None:
        snapshot = psi_day_table(batch_df, ref_counts).collect()
        sink_rows.clear()
        sink_rows.extend(snapshot)

    return (
        counts.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(assemble)
        .start()
    )
