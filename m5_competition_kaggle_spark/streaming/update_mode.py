"""Update-mode deployment variant of the day-bucket monitors.

The certified trajectories (s17-s20) run the calendar-bounded
aggregate in COMPLETE mode: every trigger re-emits the whole table,
state retains every day seen, and the attached watermark is inert.
That is exactly right while |days seen| x |buckets| stays small — but
a monitor that runs for years must EVICT closed days. This module is
that deployment shape, with its real semantics measured rather than
assumed:

- the SAME ``day_bucket_counts`` plan (imported from the KS monitor,
  not copied) runs with ``outputMode("update")``: each trigger emits
  only the (day, q) cells whose count changed, with their new totals;
  the watermark bounds STATE (closed days evict), so the aggregate
  stays |open days| x |buckets| forever;
- **Spark's watermark does NOT guarantee too-late rows are dropped**
  (the Structured Streaming guarantee is one-sided: on-time data WILL
  be aggregated; too-late data "may or may not" be). Measured on this
  build: a row 26 days late is aggregated into a freshly RE-CREATED
  state row for the already-evicted day and re-emitted with a PARTIAL
  count — an upsert sink that trusted it would overwrite the day's
  correct total. numRowsDroppedByWatermark stayed 0 in both update
  and append mode;
- therefore the MERGING SINK enforces the lateness cutoff itself: it
  tracks the maximum day it has seen and rejects upserts for days
  older than ``allowed_lateness_days`` behind it. This is the same
  rule a Delta MERGE sink would express as a partition predicate.
  Set it to the watermark delay so sink and state agree on "closed".

The test pins both directions: on-time multi-file streams converge to
the exact batch table through delta upserts, and a too-late straggler
is rejected by the sink (batch table minus exactly that row) instead
of silently corrupting a closed day.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession

from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)
from m5_competition_kaggle_spark.streaming.ks_monitor import (
    day_bucket_counts,
)


class ClosingDayStore:
    """Keyed (day_iso, key) → value store with a closed-day rule: an
    upsert for a day more than ``allowed_lateness_days`` behind the
    high-water day AS OF THE PREVIOUS BATCH is rejected (counted, not
    applied). The cutoff deliberately mirrors Spark's own watermark
    timing — computed from data seen through trigger N-1, applied to
    trigger N — so a single batch carrying many NEW days in bulk
    (backfill, restart catch-up) never self-rejects its own tail. The
    in-memory stand-in for any idempotent keyed sink with a partition
    predicate."""

    def __init__(self, allowed_lateness_days: int = 2) -> None:
        self.lateness = datetime.timedelta(int(allowed_lateness_days))
        self.data: dict = {}
        self.max_day: datetime.date | None = None
        self.rejected = 0
        # per-run epoch high-water marks: run_key -> last applied
        # batch_id. Keyed like Delta's (queryId, epochId) txn version
        # so a store shared by TWO queries (two checkpoints) keeps
        # independent dedup sequences instead of silently dropping
        # the second query's epochs.
        self.last_batch_id: dict = {}
        self.skipped_batches = 0

    def apply_batch(
        self, rows, batch_id: int | None = None, run_key: str = ""
    ) -> None:
        """Upsert one trigger's (day, key, value) rows against the
        PREVIOUS batches' high-water cutoff, then advance it. The
        value is opaque — a count for the bucket monitors, the whole
        six-int sufficient-stat tuple for the welch family.

        ``batch_id`` (the foreachBatch epoch) makes the REJECTION
        counter exact under replay: foreachBatch is at-least-once, and
        while the data upserts are naturally idempotent, a re-run
        batch would double-count its rejections — the observability
        signal the tests assert on. An already-applied batch_id is
        skipped wholesale (counted in ``skipped_batches``), the same
        dedup a Delta MERGE sink gets from its (queryId, epochId) txn
        version — and like Delta's, the mark is scoped per ``run_key``
        (the streaming helpers pass their checkpoint location), so one
        store serving several queries dedups each epoch sequence
        independently. Epochs restart at 0 only when a checkpoint is
        RESET — a store must not outlive its query's checkpoint; wiping
        the checkpoint requires a fresh store (or a new run_key), else
        the restarted epochs are skipped as replays (visible in the
        ``skipped_batches`` counter, never silent). ``None`` (direct
        calls) always applies."""
        if batch_id is not None:
            last = self.last_batch_id.get(run_key)
            if last is not None and batch_id <= last:
                self.skipped_batches += 1
                return
            self.last_batch_id[run_key] = batch_id
        cutoff = (
            None
            if self.max_day is None
            else self.max_day - self.lateness
        )
        batch_max = self.max_day
        for day, key, value in rows:
            if batch_max is None or day > batch_max:
                batch_max = day
            if cutoff is not None and day < cutoff:
                self.rejected += 1
                continue
            self.data[(str(day), key)] = value
        self.max_day = batch_max


def store_day_counts(spark: SparkSession, store: ClosingDayStore):
    """Lift the merged store back into a (day, q, c_cmp) DataFrame so
    the certified assembly kernels (`ks_monitor.ks_day_table`,
    `quantile_monitor.quantile_day_table`) run on the update-mode
    deployment's data unchanged — the store is tiny (|days| x
    |buckets|), so a local createDataFrame is the right move."""
    rows = [
        (datetime.date.fromisoformat(d), q, c)
        for (d, q), c in store.data.items()
    ]
    return spark.createDataFrame(
        rows, "day date, q bigint, c_cmp bigint"
    )


def streaming_day_buckets_update_mode(
    spark: SparkSession,
    source_dir: str,
    store: ClosingDayStore,
    checkpoint_dir: str,
    since_nanos: int | None = None,
    watermark: str = "2 days",
    **source_options,
):
    """Run the day-bucket aggregate in update mode, merging each
    trigger's changed cells into ``store`` (a :class:`ClosingDayStore`
    — the closed-day rule lives in the sink because Spark does not
    guarantee the drop; see the module docstring). Returns the started
    query (caller stops it)."""
    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    counts = day_bucket_counts(stream, since_nanos=since_nanos)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        store.apply_batch(
            (
                (r["day"], r["q"], r["c_cmp"])
                for r in batch_df.collect()
            ),
            batch_id=batch_id,
            run_key=checkpoint_dir,
        )

    return (
        counts.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge)
        .start()
    )


def streaming_day_categories_update_mode(
    spark: SparkSession,
    source_dir: str,
    store: ClosingDayStore,
    checkpoint_dir: str,
    cat_col: str = "event_type",
    since_nanos: int | None = None,
    watermark: str = "2 days",
    **source_options,
):
    """The PSI family through the same update-mode shape: the s17
    kernel's ``day_category_counts`` plan (imported from the PSI
    monitor, not copied) emits changed (day, cat) cells as deltas,
    merged under the store's closed-day rule. The store value is the
    category count, so ``psi_day_table`` runs on the lifted store
    unchanged — complete-mode re-emission of the whole multi-year
    trajectory every trigger is gone, state stays |open days| x
    |categories|. Returns the started query (caller stops it)."""
    from m5_competition_kaggle_spark.streaming.psi_monitor import (
        day_category_counts,
    )

    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    counts = day_category_counts(
        stream, cat_col=cat_col, since_nanos=since_nanos
    )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        store.apply_batch(
            (
                (r["day"], r["cat"], r["c_cmp"])
                for r in batch_df.collect()
            ),
            batch_id=batch_id,
            run_key=checkpoint_dir,
        )

    return (
        counts.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge)
        .start()
    )


def store_day_category_counts(
    spark: SparkSession, store: ClosingDayStore
):
    """Lift a day-category store back into the (day, cat, c_cmp)
    frame ``psi_monitor.psi_day_table`` consumes."""
    rows = [
        (datetime.date.fromisoformat(d), c, n)
        for (d, c), n in store.data.items()
    ]
    return spark.createDataFrame(
        rows, "day date, cat string, c_cmp bigint"
    )


def streaming_day_arm_stats_update_mode(
    spark: SparkSession,
    source_dir: str,
    store: ClosingDayStore,
    checkpoint_dir: str,
    group_col: str = "event_type",
    watermark: str = "2 days",
    **source_options,
):
    """The welch-monitor family through the same update-mode shape:
    per-(day, group) arm sufficient statistics (six int64s — the s19
    kernel, imported) emitted as deltas and merged under the store's
    closed-day rule. The store's value is the whole six-tuple, so the
    t² assembly (`operators/abtest.welch_from_stats`) runs on the
    lifted store unchanged."""
    from m5_competition_kaggle_spark.streaming.welch_monitor import (
        day_arm_stats,
    )

    stream = read_events_stream(
        spark, source_dir, **source_options
    ).withWatermark("ts", watermark)
    stats = day_arm_stats(stream, group_col=group_col)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        store.apply_batch(
            (
                (
                    r["day"],
                    r[group_col],
                    (
                        r["n_a"], r["n_b"], r["sum_a"],
                        r["sum_b"], r["ss_a"], r["ss_b"],
                    ),
                )
                for r in batch_df.collect()
            ),
            batch_id=batch_id,
            run_key=checkpoint_dir,
        )

    return (
        stats.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge)
        .start()
    )


def store_day_arm_stats(spark: SparkSession, store: ClosingDayStore):
    """Lift a day-arm-stats store back into the frame
    `welch_day_table` consumes."""
    rows = [
        (datetime.date.fromisoformat(d), g, *v)
        for (d, g), v in store.data.items()
    ]
    return spark.createDataFrame(
        rows,
        "day date, event_type string, n_a bigint, n_b bigint, "
        "sum_a bigint, sum_b bigint, ss_a bigint, ss_b bigint",
    )
