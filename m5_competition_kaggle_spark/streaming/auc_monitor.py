"""Streaming daily ROC-AUC monitor — per-event-time-day classifier
quality, the MODEL-QUALITY sibling of the drift monitors (PSI s17,
KS s18, Welch s19, quantiles s20).

Drift monitors watch the inputs; this one watches the decision
surface: each day's AUC of a score column against a binary outcome
(does yesterday's model still rank positives above negatives?). The
plan follows the monitor family pattern exactly:

- per-(day, score, class) counts are a tumbling-day streaming
  aggregation — state bounded by |days seen| × |distinct quantized
  scores| (integer granularity, like the KS monitor), independent of
  event volume;
- the AUC assembly runs per trigger on the BOUNDED aggregate through
  the SAME exact-integer kernel the batch query uses
  (``operators/auc.auc_from_cells`` — x144's arithmetic): one KEYED
  window over the cells, never a global rank. Stream == batch is an
  arithmetic identity;
- the update-mode deployment merges changed cells into a
  ``ClosingDayStore`` (sink-enforced lateness rule — Spark's
  watermark drop guarantee is one-sided, measured in
  ``streaming/update_mode.py``), so a multi-year stream keeps state
  at |open days| × |scores| and the trajectory re-assembles from the
  store, not from re-emission.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.auc import auc_from_cells
from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)
from m5_competition_kaggle_spark.streaming.update_mode import (
    ClosingDayStore,
)


def day_score_class_counts(
    events: DataFrame,
    value_col: str = "value",
    pos_condition: str = "event_type = 'purchase'",
    since_nanos: int | None = None,
) -> DataFrame:
    """(day, score, c_pos, c_neg) tumbling-day cells — batch or
    stream (the identical plan runs incrementally). Integer-quantized
    score (round(value), the monitor-family granularity) keeps the
    state a few hundred cells per open day."""
    if since_nanos is not None:
        events = events.filter(
            F.col("ts_nanos") >= F.lit(int(since_nanos))
        )
    pos = F.expr(f"CAST(({pos_condition}) AS BIGINT)")
    return (
        events.groupBy(
            F.window("ts", "1 day").alias("__w"),
            F.expr(f"CAST(round({value_col}) AS BIGINT)").alias(
                "score"
            ),
        )
        .agg(
            F.sum(pos).alias("c_pos"),
            F.sum(F.lit(1) - pos).alias("c_neg"),
        )
        .select(
            F.col("__w.start").cast("date").alias("day"),
            "score",
            "c_pos",
            "c_neg",
        )
    )


def auc_day_table(day_cells: DataFrame) -> DataFrame:
    """Daily AUC trajectory over the bounded cells — one row per day:
    day, n_pos, n_neg, n_scores, auc_ppm."""
    return auc_from_cells(day_cells, ["day"])


def store_day_auc_cells(
    spark: SparkSession, store: ClosingDayStore
) -> DataFrame:
    """Lift the merged store back into (day, score, c_pos, c_neg)
    cells so ``auc_day_table`` runs on the update-mode deployment's
    data unchanged — the store is tiny (|days| × |scores|)."""
    rows = [
        (datetime.date.fromisoformat(d), s, int(cp), int(cn))
        for (d, s), (cp, cn) in store.data.items()
    ]
    return spark.createDataFrame(
        rows, "day date, score bigint, c_pos bigint, c_neg bigint"
    )


def streaming_day_auc_update_mode(
    spark: SparkSession,
    source_dir: str,
    store: ClosingDayStore,
    checkpoint_dir: str,
    value_col: str = "value",
    pos_condition: str = "event_type = 'purchase'",
    since_nanos: int | None = None,
    watermark: str = "2 days",
    **source_options,
):
    """Run the day-score-class aggregate in update mode, merging each
    trigger's changed cells into ``store`` keyed (day, score) with
    the (c_pos, c_neg) pair as the opaque value (the welch-family
    tuple pattern). Returns the started query (caller stops it)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    cells = day_score_class_counts(
        stream,
        value_col=value_col,
        pos_condition=pos_condition,
        since_nanos=since_nanos,
    )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        store.apply_batch(
            (
                (r["day"], r["score"], (r["c_pos"], r["c_neg"]))
                for r in batch_df.collect()
            ),
            batch_id=batch_id,
            run_key=checkpoint_dir,
        )

    return (
        cells.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge)
        .start()
    )
