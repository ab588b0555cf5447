"""Streaming Gini concentration trajectory — the third readout on the
distribution monitor's cells.

`streaming/ks_monitor.py` maintains calendar-bounded per-(day, bucket)
value counts; the KS assembly reads the worst-point drift vs a frozen
reference, the CvM assembly (`streaming/cvm_monitor.py`) the
whole-distribution drift. This module adds the reference-FREE readout:
each day's own value-concentration Gini (`operators/gini.py`
`gini_from_cells` — the day cells ARE the grouped value cells the
kernel consumes), so a day whose mass suddenly concentrates in a few
huge values alarms even when its ECDF stays close to the reference in
both gap metrics. One streaming kernel, three certified assemblies —
the trend-monitor pattern on the distribution monitor.

Requires a nonnegative value domain (the Gini contract); the events
fixture's value column is nonnegative by construction, and a deployer
with signed values shifts or clamps upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.gini import gini_from_cells
from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)
from m5_competition_kaggle_spark.streaming.ks_monitor import (
    day_bucket_counts,
)


def gini_day_table(day_counts: DataFrame) -> DataFrame:
    """Per-day Gini assembly over the bounded aggregate.

    ``day_counts``: (day, q, c_cmp) — the ks_monitor cell shape.
    Output one row per day: day, n_members, total, max_value,
    top_share_ppm, rank_mass, gini_ppm —
    `operators/gini.gini_from_cells` arithmetic verbatim. No
    reference side: concentration is a property of the day itself."""
    return gini_from_cells(
        day_counts.select(
            "day", "q", F.col("c_cmp").alias("c")
        ),
        ["day"],
    )


def streaming_gini_trajectory(
    spark: SparkSession,
    source_dir: str,
    sink_rows: list,
    checkpoint_dir: str,
    watermark: str = "2 days",
    **source_options,
):
    """Wire the Gini readout over a real file-source stream — the
    streaming_ks_trajectory plan verbatim with the Gini assembly in
    ``foreachBatch`` (complete mode; the calendar-bounded aggregate is
    the state, the watermark is inert under complete mode — see the
    ks_monitor module docstring). Appends the FINAL trigger's rows to
    ``sink_rows``; returns the started query (caller stops it)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    counts = day_bucket_counts(stream)

    def assemble(batch_df: DataFrame, _batch_id: int) -> None:
        snapshot = gini_day_table(batch_df).collect()
        sink_rows.clear()
        sink_rows.extend(snapshot)

    return (
        counts.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(assemble)
        .start()
    )
