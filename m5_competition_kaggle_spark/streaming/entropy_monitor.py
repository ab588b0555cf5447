"""Streaming Shannon-entropy trajectory — the fourth readout on the
distribution monitor's cells.

`streaming/ks_monitor.py` maintains calendar-bounded per-(day, bucket)
value counts; the KS assembly reads worst-point drift vs a frozen
reference, the CvM assembly (`streaming/cvm_monitor.py`) broad drift,
and the Gini assembly (`streaming/gini_monitor.py`) reference-free
concentration. This module adds the reference-free DIVERSITY readout:
each day's exact micro-nat Shannon entropy of its value distribution,
on the x180 quantized-log kernel — h_num = Σ_q c·(L(n) − L(c)) with
L(x) = round(ln(x)·10⁶), integer arithmetic both engines floor
identically. A day whose value distribution collapses onto few
buckets alarms here even when its ECDF stays inside both gap metrics
and its Gini moves little (entropy sees CARDINALITY collapse; Gini
sees mass concentration — the planted-cell queue test separates
them). One streaming kernel, four certified assemblies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)
from m5_competition_kaggle_spark.streaming.ks_monitor import (
    day_bucket_counts,
)

LOG_Q = 1_000_000


def entropy_day_table(day_counts: DataFrame) -> DataFrame:
    """Per-day entropy assembly over the bounded aggregate.

    ``day_counts``: (day, q, c_cmp) — the ks_monitor cell shape.
    Output one row per day: day, n_members (Σc), n_cells (distinct
    buckets), h_num (Σ c·(L(n)−L(c)) exact integer micro-nat·count
    units, ≥ 0 termwise), h_unat (h_num DIV n — the floor both
    engines take identically). Cell-local arithmetic plus two keyed
    day-level aggregates; no reference side."""
    cells = day_counts.select(
        "day", "q", F.col("c_cmp").cast("long").alias("c")
    )
    per_day = cells.groupBy("day").agg(
        F.sum("c").alias("n_members"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    terms = cells.join(F.broadcast(per_day), "day").select(
        "day",
        "n_members",
        "n_cells",
        F.expr(
            f"c * (CAST(round(ln(n_members) * {LOG_Q}) AS BIGINT)"
            f" - CAST(round(ln(c) * {LOG_Q}) AS BIGINT))"
        ).alias("term"),
    )
    return (
        terms.groupBy("day", "n_members", "n_cells")
        .agg(F.sum("term").alias("h_num"))
        .select(
            "day",
            "n_members",
            "n_cells",
            "h_num",
            F.expr("h_num DIV n_members").alias("h_unat"),
        )
    )


def streaming_entropy_trajectory(
    spark: SparkSession,
    source_dir: str,
    sink_rows: list,
    checkpoint_dir: str,
    watermark: str = "2 days",
    **source_options,
):
    """Wire the entropy readout over a real file-source stream — the
    streaming_gini_trajectory plan verbatim with the entropy assembly
    in ``foreachBatch`` (complete mode; the calendar-bounded aggregate
    is the state, the watermark is inert under complete mode — see the
    ks_monitor module docstring). Appends the FINAL trigger's rows to
    ``sink_rows``; returns the started query (caller stops it)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    counts = day_bucket_counts(stream)

    def assemble(batch_df: DataFrame, _batch_id: int) -> None:
        snapshot = entropy_day_table(batch_df).collect()
        sink_rows.clear()
        sink_rows.extend(snapshot)

    return (
        counts.writeStream.outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(assemble)
        .start()
    )
