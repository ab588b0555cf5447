"""Streaming Cramér–von Mises drift trajectory — the whole-distribution
companion readout on the KS monitor's cells.

`streaming/ks_monitor.py` maintains the ONE piece of streaming state a
numeric drift monitor needs — calendar-bounded per-(day, bucket)
counts — and reads the worst-point ECDF gap off it. This module adds
the second readout on the *identical* cells: the permille-quantized CvM
gap energy (`operators/cvm.cvm_from_cells`), which integrates the
SQUARED gap over the pooled support and therefore catches broad
low-amplitude drift a single-point max misses. One streaming kernel,
two certified assemblies — the trend-monitor pattern
(`streaming/trend_monitor.py`: changepoint / Theil–Sen / MASE on one
cell store) applied to the distribution monitor.

Nothing here re-aggregates the stream: ``day_bucket_counts`` is
imported from the KS monitor unchanged, so a deployment that already
runs the KS trajectory gets the CvM trajectory by adding one
foreachBatch assembly over state it already holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.cvm import cvm_from_cells
from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)
from m5_competition_kaggle_spark.streaming.ks_monitor import (
    day_bucket_counts,
)


def cvm_day_table(
    day_counts: DataFrame, ref_counts: DataFrame
) -> DataFrame:
    """CvM trajectory assembly over the bounded aggregate.

    ``day_counts``: (day, q, c_cmp). ``ref_counts``: (q, c_ref) — the
    frozen reference histogram (broadcast). Buckets seen on only one
    side contribute zero counts on the other (the ks_day_table ECDF
    union). Output one row per day: day, n_ref, n_cmp, n_cells,
    gap_energy, omega2_micro — `operators/cvm.cvm_from_cells`
    arithmetic verbatim."""
    ref = F.broadcast(ref_counts.select("q", "c_ref"))
    days = day_counts.select("day").distinct()
    grid = days.crossJoin(ref)
    cells = (
        grid.join(day_counts, ["day", "q"], "full_outer")
        .withColumn("c_ref", F.coalesce("c_ref", F.lit(0)))
        .withColumn("c_cmp", F.coalesce("c_cmp", F.lit(0)))
    )
    return cvm_from_cells(cells, ["day"])


def streaming_cvm_trajectory(
    spark: SparkSession,
    source_dir: str,
    ref_counts: DataFrame,
    since_nanos: int,
    sink_rows: list,
    checkpoint_dir: str,
    watermark: str = "2 days",
    **source_options,
):
    """Wire the CvM readout over a real file-source stream — the
    streaming_ks_trajectory plan verbatim with the CvM assembly in
    ``foreachBatch`` (complete mode; the calendar-bounded aggregate is
    the state, the watermark is inert under complete mode — see the
    ks_monitor module docstring). Appends the FINAL trigger's rows to
    ``sink_rows``; returns the started query (caller stops it)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    counts = day_bucket_counts(stream, since_nanos=since_nanos)

    def assemble(batch_df: DataFrame, _batch_id: int) -> None:
        snapshot = cvm_day_table(batch_df, ref_counts).collect()
        sink_rows.clear()
        sink_rows.extend(snapshot)

    return (
        counts.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(assemble)
        .start()
    )
