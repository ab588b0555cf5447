"""Streaming daily calibration (ECE) monitor — per-event-time-day
expected calibration error, the CALIBRATION sibling of the model-
quality monitor (AUC, s21): AUC watches whether the model still RANKS
correctly; this watches whether its scores still MEAN what they say
(score 0.7 ⇒ ~70% positives). A model can hold its AUC while its
calibration drifts (score inflation) — the two monitors are
complementary, not redundant.

The plan follows the monitor-family pattern exactly:

- per-(day, bin) sufficient statistics are a tumbling-day streaming
  aggregation: (n, n_pos, score_sum) per permille-score bin — state
  bounded by |days seen| × |bins| (bin width caps the domain),
  independent of event volume;
- the per-day ECE assembly runs on the BOUNDED cells through the
  exact telescoped-integer identity x145 certifies:
  Σ_b n_b·|acc_b − conf_b| = Σ_b |1000·n_pos_b − score_sum_b| / 1000,
  so the scalar is exact with NO truncation; stream == batch is an
  arithmetic identity;
- the update-mode deployment merges changed (day, bin) cells into a
  ``ClosingDayStore`` with the (n, n_pos, score_sum) triple as the
  opaque value (the welch-family tuple pattern), under the
  sink-enforced lateness rule (Spark's watermark drop guarantee is
  one-sided — measured in ``streaming/update_mode.py``).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)
from m5_competition_kaggle_spark.streaming.update_mode import (
    ClosingDayStore,
)


def day_bin_stats(
    events: DataFrame,
    score_expr: str = "CAST(round(value) AS BIGINT)",
    pos_condition: str = "event_type = 'purchase'",
    bin_width: int = 10,
    since_nanos: int | None = None,
) -> DataFrame:
    """(day, bin, n, n_pos, score_sum) tumbling-day cells — batch or
    stream (the identical plan runs incrementally). ``score_expr``
    must yield a bounded integer permille-like score; ``bin_width``
    caps the per-day state at domain/width cells."""
    if since_nanos is not None:
        events = events.filter(
            F.col("ts_nanos") >= F.lit(int(since_nanos))
        )
    pos = F.expr(f"CAST(({pos_condition}) AS BIGINT)")
    score = F.expr(score_expr)
    return (
        events.groupBy(
            F.window("ts", "1 day").alias("__w"),
            (score - (score % F.lit(int(bin_width))))
            .alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(pos).alias("n_pos"),
            F.sum(score).alias("score_sum"),
        )
        .select(
            F.col("__w.start").cast("date").alias("day"),
            "bin",
            "n",
            "n_pos",
            "score_sum",
        )
    )


def ece_day_table(day_cells: DataFrame) -> DataFrame:
    """Daily ECE trajectory over the bounded cells — one row per day:
    day, n, n_bins, abs_dev_sum (= Σ_b |1000·n_pos_b − score_sum_b|,
    the exact telescoped numerator), ece_ppm (= 1000·abs_dev_sum DIV
    n — permille deviation scaled to ppm because the numerator
    carries the extra factor 1000), mce_permille (worst bin)."""
    dev = day_cells.select(
        "day",
        "n",
        F.abs(
            F.lit(1000) * F.col("n_pos") - F.col("score_sum")
        ).alias("d"),
    ).withColumn("d_permille", F.expr("d DIV n"))
    return (
        dev.groupBy("day")
        .agg(
            F.sum("n").alias("n"),
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("d").alias("abs_dev_sum"),
            F.max("d_permille").alias("mce_permille"),
        )
        .select(
            "day",
            "n",
            "n_bins",
            "abs_dev_sum",
            F.expr("1000 * abs_dev_sum DIV n").alias("ece_ppm"),
            "mce_permille",
        )
    )


def store_day_bin_stats(
    spark: SparkSession, store: ClosingDayStore
) -> DataFrame:
    """Lift the merged store back into (day, bin, n, n_pos,
    score_sum) cells so ``ece_day_table`` runs on the update-mode
    deployment's data unchanged — the store is tiny (|days| ×
    |bins|)."""
    rows = [
        (datetime.date.fromisoformat(d), b, int(n), int(np_), int(ss))
        for (d, b), (n, np_, ss) in store.data.items()
    ]
    return spark.createDataFrame(
        rows,
        "day date, bin bigint, n bigint, n_pos bigint, "
        "score_sum bigint",
    )


def streaming_day_ece_update_mode(
    spark: SparkSession,
    source_dir: str,
    store: ClosingDayStore,
    checkpoint_dir: str,
    score_expr: str = "CAST(round(value) AS BIGINT)",
    pos_condition: str = "event_type = 'purchase'",
    bin_width: int = 10,
    since_nanos: int | None = None,
    watermark: str = "2 days",
    **source_options,
):
    """Run the day-bin calibration aggregate in update mode, merging
    each trigger's changed cells into ``store`` keyed (day, bin) with
    the (n, n_pos, score_sum) triple as the opaque value. Returns the
    started query (caller stops it)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    cells = day_bin_stats(
        stream,
        score_expr=score_expr,
        pos_condition=pos_condition,
        bin_width=bin_width,
        since_nanos=since_nanos,
    )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        store.apply_batch(
            (
                (
                    r["day"],
                    r["bin"],
                    (r["n"], r["n_pos"], r["score_sum"]),
                )
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
