"""Streaming daily quantile trajectory — the percentile dashboard.

The production monitor next to the drift trackers (s17 PSI, s18 KS):
per event-time day, exact p50/p95/p99 of the integer-quantized value.
Latency and score dashboards are THIS query. Follows the monitor
pattern:

- per-(day, bucket) counts are the SAME tumbling-day aggregation
  the KS monitor uses (`ks_monitor.day_bucket_counts` — imported,
  not copied): state is bounded by the CALENDAR (days seen × value
  grid), independent of event volume; complete mode retains every
  day (the watermark is inert under complete mode — see
  ``streaming/update_mode.py`` for the eviction variant and the
  measured sink-side lateness rule it needs);
- the quantile assembly runs on the bounded aggregate per trigger in
  ``foreachBatch``: the q-quantile is the smallest bucket whose
  cumulative count reaches q·n — pure integer threshold comparisons
  (the x134 weighted-quantile rule with weight = count), so the
  trajectory hash-certifies.

s20's batch twin certifies the day table against DuckDB;
tests/test_streaming_quantiles.py proves the file-source stream emits
the identical trajectory across multi-file triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)
from m5_competition_kaggle_spark.streaming.ks_monitor import (
    day_bucket_counts,
)

QUANTILES = ((500, "q500"), (950, "q950"), (990, "q990"))


def quantile_day_table(day_counts: DataFrame) -> DataFrame:
    """Exact integer quantiles per day over the bounded (day, q,
    c_cmp) bucket table: day, n, q500, q950, q990 — the smallest
    bucket value whose cumulative count reaches permille/1000 of the
    day's total."""
    w_cum = (
        Window.partitionBy("day")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("day")
    walked = day_counts.withColumn(
        "__cum", F.sum("c_cmp").over(w_cum)
    ).withColumn("__n", F.sum("c_cmp").over(w_all))
    aggs = [F.max("__n").alias("n")]
    for permille, name in QUANTILES:
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") * 1000
                    >= F.col("__n") * permille,
                    F.col("q"),
                )
            ).alias(name)
        )
    return walked.groupBy("day").agg(*aggs)


def streaming_quantile_trajectory(
    spark: SparkSession,
    source_dir: str,
    sink_rows: list,
    checkpoint_dir: str,
    watermark: str = "2 days",
    **source_options,
):
    """Wire the monitor over a real file-source stream: calendar-bounded
    day-bucket counts (the shared KS-monitor aggregation), quantile
    assembly per trigger in ``foreachBatch`` (complete mode — the aggregate is
    calendar-bounded; the attached watermark is inert here, see the
    module docstring). Appends the FINAL trigger's rows to
    ``sink_rows``; returns the started query (caller stops it)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    counts = day_bucket_counts(stream)

    def assemble(batch_df: DataFrame, _batch_id: int) -> None:
        snapshot = quantile_day_table(batch_df).collect()
        sink_rows.clear()
        sink_rows.extend(snapshot)

    return (
        counts.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(assemble)
        .start()
    )
