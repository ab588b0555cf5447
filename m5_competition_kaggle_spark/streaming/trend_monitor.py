"""Streaming trend monitors — daily per-key cells feeding the batch
changepoint (x149) and Theil–Sen (x153) kernels. The monitor family
pattern (psi/ks/welch/quantile/auc/ece precedents): the STREAM only
maintains per-(day, key) sufficient statistics — a tumbling-day
aggregate whose state is |days| × |event types|, independent of event
volume — and the trend assembly runs on those bounded cells, where
stream == batch is an arithmetic identity because the cells are exact
integer aggregates.

Two assemblies share one kernel:

- ``changepoint_from_cells`` — WHERE did each key's daily VOLUME
  regime shift? ``operators/changepoint.best_mean_shift`` over the
  per-day counts (x149's statistic at the same day granularity).
- ``theil_sen_from_cells`` — the robust daily trend of each key's
  permille value sum (x153's estimator), breakdown-resistant against
  the corrupted days a drift monitor exists to catch.

The update-mode deployment merges changed (day, key) cells into a
``ClosingDayStore`` under the sink-enforced lateness rule
(``streaming/update_mode.py`` — Spark's watermark drop guarantee is
one-sided, so eviction is enforced at the sink, never assumed).
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


def day_key_cells(
    events: DataFrame,
    key_col: str = "event_type",
    since_nanos: int | None = None,
) -> DataFrame:
    """(day, key, n, y_sum) tumbling-day cells — batch or stream (the
    identical plan runs incrementally). ``n`` is the event count,
    ``y_sum`` the exact permille value sum; both assemblies read from
    this one kernel."""
    if since_nanos is not None:
        events = events.filter(
            F.col("ts_nanos") >= F.lit(int(since_nanos))
        )
    return (
        events.groupBy(
            F.window("ts", "1 day").alias("__w"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.expr("CAST(round(value * 1000) AS BIGINT)")
            ).alias("y_sum"),
        )
        .select(
            F.col("__w.start").cast("date").alias("day"),
            "key",
            "n",
            "y_sum",
        )
    )


def changepoint_from_cells(cells: DataFrame) -> DataFrame:
    """Best single mean-shift split of each key's daily-count series
    over the bounded cells (x149's exact statistic; cp_t is the DATE
    of the last left-segment day)."""
    from m5_competition_kaggle_spark.operators.changepoint import (
        best_mean_shift,
    )

    series = cells.select("key", "day", "n")
    return best_mean_shift(series, "key", "day", "n")


def theil_sen_from_cells(cells: DataFrame) -> DataFrame:
    """Theil–Sen robust slope of each key's daily permille-sum series
    over the bounded cells (x153's exact lower-median pair pick); time
    is integer epoch-days so slope_ppm is permille-units per day."""
    from m5_competition_kaggle_spark.operators.theil_sen import (
        theil_sen_slope,
    )

    series = cells.select(
        "key",
        F.datediff(F.col("day"), F.lit("1970-01-01")).alias("t_day"),
        "y_sum",
    )
    return theil_sen_slope(series, "key", "t_day", "y_sum")


def theil_sen_from_cells_windowed(
    cells: DataFrame, trailing_days: int = 28
) -> DataFrame:
    """Trailing-window Theil–Sen: the x153 kernel over only each
    key's most recent ``trailing_days`` days of cells.

    Exact Theil–Sen is quadratic in series length by definition, so
    the unbounded assembly's pair set grows with CALENDAR SPAN —
    fine for the ~30-day monitor deployments, measured 146× wall at
    an adversarial 8.5-year span (BASELINE.md r12 events probe).
    This is the certified scale path for long-lived monitors: pairs
    are bounded by trailing_days²/2 per key FOREVER (28 days → ≤378
    pairs), regardless of how long the stream has been running, and
    a trailing window is what a live trend readout means anyway.
    The per-key max day comes from one keyed aggregate broadcast
    back — no global collect, no single-partition exchange."""
    tmax = cells.groupBy("key").agg(F.max("day").alias("__dmax"))
    recent = (
        cells.join(F.broadcast(tmax), "key")
        .filter(
            F.col("day")
            > F.date_sub(F.col("__dmax"), int(trailing_days))
        )
        .drop("__dmax")
    )
    return theil_sen_from_cells(recent)


def mase_from_cells(cells: DataFrame) -> DataFrame:
    """MASE with the seasonal-naive (m=7) benchmark over the bounded
    cells (x168's exact integer arithmetic on the monitor's day
    grid): numerator the held-out last week under the lag-7
    forecaster, denominator the in-sample seasonal-naive error —
    the live is-the-forecaster-still-adequate readout next to the
    changepoint (where did it break) and trend (where is it going)
    assemblies."""
    series = cells.select("key", "day", F.col("y_sum").alias("y"))
    lagged = series.alias("a").join(
        series.select(
            "key",
            F.date_add(F.col("day"), 7).alias("day"),
            F.col("y").alias("ylag"),
        ).alias("b"),
        ["key", "day"],
    )
    tmax = series.groupBy("key").agg(F.max("day").alias("dmax"))
    marked = lagged.join(F.broadcast(tmax), "key").select(
        "key",
        F.abs(F.col("y") - F.col("ylag")).alias("ae"),
        (F.col("day") > F.date_sub(F.col("dmax"), 7)).alias(
            "is_test"
        ),
    )
    return (
        marked.groupBy("key")
        .agg(
            F.sum(F.when(~F.col("is_test"), 1).otherwise(0))
            .cast("long")
            .alias("n_den"),
            F.sum(F.when(F.col("is_test"), 1).otherwise(0))
            .cast("long")
            .alias("n_test"),
            F.sum(
                F.when(~F.col("is_test"), F.col("ae")).otherwise(0)
            )
            .cast("long")
            .alias("san_train"),
            F.sum(
                F.when(F.col("is_test"), F.col("ae")).otherwise(0)
            )
            .cast("long")
            .alias("sae_test"),
        )
        .select(
            "key",
            "n_den",
            "n_test",
            "san_train",
            "sae_test",
            F.expr(
                "CASE WHEN san_train > 0 AND n_test > 0 THEN "
                "(1000000 * sae_test * n_den) "
                "DIV (n_test * san_train) END"
            ).alias("mase_ppm"),
        )
    )


def store_day_cells(
    spark: SparkSession, store: ClosingDayStore
) -> DataFrame:
    """Lift the merged store back into (day, key, n, y_sum) cells so
    either assembly runs on the update-mode deployment's data
    unchanged — the store is tiny (|days| × |keys|)."""
    rows = [
        (datetime.date.fromisoformat(d), k, int(n), int(ys))
        for (d, k), (n, ys) in store.data.items()
    ]
    return spark.createDataFrame(
        rows, "day date, key string, n bigint, y_sum bigint"
    )


def streaming_day_cells_update_mode(
    spark: SparkSession,
    source_dir: str,
    store: ClosingDayStore,
    checkpoint_dir: str,
    key_col: str = "event_type",
    since_nanos: int | None = None,
    watermark: str = "2 days",
    **source_options,
):
    """Run the day-cell aggregate in update mode, merging each
    trigger's changed cells into ``store`` keyed (day, key) with the
    (n, y_sum) pair as the opaque value. Returns the started query
    (caller stops it)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    cells = day_key_cells(
        stream, key_col=key_col, since_nanos=since_nanos
    )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        store.apply_batch(
            (
                (r["day"], r["key"], (r["n"], r["y_sum"]))
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
