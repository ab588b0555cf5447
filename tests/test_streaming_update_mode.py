"""Update-mode day-bucket monitor (streaming/update_mode.py): the
eviction-capable deployment shape the complete-mode monitors' docs
promise. Two directions pinned:

1. an on-time multi-file stream merges, via upserts of changed cells
   only, to EXACTLY the batch day-bucket table;
2. a too-late straggler is REJECTED BY THE SINK's closed-day rule —
   the merged store equals the batch table minus exactly that row.
   Spark itself does NOT guarantee the drop (measured: the 26-day-late
   row re-creates the evicted day's state and re-emits a PARTIAL
   count), so trusting the upsert would overwrite the day's correct
   total — the exact silent corruption this test exists to prevent.
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.ks_monitor import (
    day_bucket_counts,
)
from m5_competition_kaggle_spark.streaming.update_mode import (
    ClosingDayStore,
    streaming_day_buckets_update_mode,
)

SF = "/root/testdata/sf0.001"
NS_PER_DAY = 86_400_000_000_000


def _stage(df, src, name):
    tmp = os.path.join(src, f"__{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(tmp, f),
                os.path.join(src, f"part-{name}.parquet"),
            )
    shutil.rmtree(tmp)


def _batch_table(spark, df=None):
    ev = df if df is not None else load_table(spark, SF, "events")
    return {
        (str(r["day"]), r["q"]): r["c_cmp"]
        for r in day_bucket_counts(ev).collect()
    }


def _run(spark, src, ckpt, **opts):
    store = ClosingDayStore(allowed_lateness_days=2)
    q = streaming_day_buckets_update_mode(
        spark, src, store, ckpt, **opts
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()
    return store, progress


def test_update_mode_merges_to_batch_table(spark):
    ev = load_table(spark, SF, "events")
    expected = _batch_table(spark)
    assert expected
    src = tempfile.mkdtemp(prefix="upd_src_")
    ckpt = tempfile.mkdtemp(prefix="upd_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    try:
        # two files, one trigger each: day cells straddling the split
        # must arrive as two UPDATES to the same key, last write wins
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        store, progress = _run(spark, src, ckpt, maxFilesPerTrigger=1)
        assert store.data == expected
        assert store.rejected == 0
        # the deployment's point: state EVICTS closed days. After the
        # final trigger the store holds every (day, q) cell ever seen,
        # but Spark's state holds only days the watermark leaves open
        # — strictly fewer rows than the full table.
        final_state = progress[-1]["stateOperators"][0]
        assert 0 < final_state["numRowsTotal"] < len(expected)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_update_mode_drops_stragglers_beyond_watermark(spark):
    ev = load_table(spark, SF, "events")
    src = tempfile.mkdtemp(prefix="updlate_src_")
    ckpt = tempfile.mkdtemp(prefix="updlate_ckpt_")
    lo, hi = ev.agg(
        F.min("ts_nanos"), F.max("ts_nanos")
    ).collect()[0]
    try:
        # one straggler from the FIRST day, withheld until after the
        # stream has seen the corpus max: watermark = max_ts - 2 days
        # >> straggler ts, so trigger 2 must drop it
        straggler = ev.orderBy("ts_nanos", "event_id").limit(1)
        s_key = straggler.select(
            F.col("ts_nanos"),
            F.expr("CAST(round(value) AS BIGINT)").alias("q"),
        ).collect()[0]
        assert s_key["ts_nanos"] < hi - 3 * NS_PER_DAY
        rest = ev.join(
            straggler.select("event_id"), "event_id", "left_anti"
        )
        _stage(rest, src, "a")
        _stage(straggler, src, "b")
        store, _ = _run(spark, src, ckpt, maxFilesPerTrigger=1)
        assert store.rejected == 1
        assert store.data == _batch_table(spark, rest)
        assert store.data != _batch_table(spark)  # the drop is observable
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_update_mode_store_feeds_certified_assembly(spark):
    """The merged store drives the SAME assembly kernels the certified
    complete-mode monitors use: quantile_day_table over the lifted
    store equals the s20 batch twin row-for-row."""
    from m5_competition_kaggle_spark.queries.extensions_r8f import (
        s20_stream_quantiles,
    )
    from m5_competition_kaggle_spark.streaming.quantile_monitor import (
        quantile_day_table,
    )
    from m5_competition_kaggle_spark.streaming.update_mode import (
        store_day_counts,
    )

    ev = load_table(spark, SF, "events")
    src = tempfile.mkdtemp(prefix="updasm_src_")
    ckpt = tempfile.mkdtemp(prefix="updasm_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        store, _ = _run(spark, src, ckpt, maxFilesPerTrigger=1)
        got = sorted(
            (str(r["day"]), r["n"], r["q500"], r["q950"], r["q990"])
            for r in quantile_day_table(
                store_day_counts(spark, store)
            ).collect()
        )
        expected = sorted(
            (str(r["day"]), r["n"], r["q500"], r["q950"], r["q990"])
            for r in s20_stream_quantiles(spark, SF).collect()
        )
        assert expected and got == expected
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_update_mode_survives_restart_with_persistent_sink(spark):
    """The realistic deployment lifecycle: the query stops mid-corpus
    and restarts from the SAME checkpoint against the SAME (external,
    persistent) sink. Committed batches are not replayed; the merged
    store after the second run equals the batch table exactly."""
    ev = load_table(spark, SF, "events")
    expected = _batch_table(spark)
    src = tempfile.mkdtemp(prefix="updrec_src_")
    ckpt = tempfile.mkdtemp(prefix="updrec_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    store = ClosingDayStore(allowed_lateness_days=2)

    def run_round():
        q = streaming_day_buckets_update_mode(
            spark, src, store, ckpt
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        run_round()
        first = dict(store.data)
        assert first and first != expected  # half-corpus snapshot
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        run_round()
        assert store.data == expected
        assert store.rejected == 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_update_mode_welch_family_matches_batch_twin(spark):
    """The welch family through the same deployment shape: day-arm
    sufficient stats merged as six-tuple values, lifted back through
    the shared welch_from_stats kernel, equal to the s19 batch twin."""
    from m5_competition_kaggle_spark.queries.extensions_r8d import (
        s19_stream_welch,
    )
    from m5_competition_kaggle_spark.streaming.update_mode import (
        store_day_arm_stats,
        streaming_day_arm_stats_update_mode,
    )
    from m5_competition_kaggle_spark.streaming.welch_monitor import (
        welch_day_table,
    )

    def key(r):
        return (
            str(r["day"]), r["event_type"], r["n_a"], r["n_b"],
            r["sum_a"], r["sum_b"], r["ss_a"], r["ss_b"],
            None if r["welch_t2"] is None else round(r["welch_t2"], 9),
        )

    expected = sorted(key(r) for r in s19_stream_welch(spark, SF).collect())
    assert expected

    ev = load_table(spark, SF, "events")
    src = tempfile.mkdtemp(prefix="updwelch_src_")
    ckpt = tempfile.mkdtemp(prefix="updwelch_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    store = ClosingDayStore(allowed_lateness_days=2)
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        q = streaming_day_arm_stats_update_mode(
            spark, src, store, ckpt, maxFilesPerTrigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            key(r)
            for r in welch_day_table(
                store_day_arm_stats(spark, store)
            ).collect()
        )
        assert got == expected and store.rejected == 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_update_mode_psi_family_matches_batch_twin(spark):
    """The PSI family through the same deployment shape, including a
    restart from the same checkpoint against the persistent store:
    day-category counts merged as deltas, lifted back through the
    shared psi_day_table kernel, equal to the s17 batch twin."""
    from m5_competition_kaggle_spark.queries.extensions_r8b import (
        PSI_SPLIT_NS,
        s17_stream_psi,
    )
    from m5_competition_kaggle_spark.streaming.psi_monitor import (
        psi_day_table,
    )
    from m5_competition_kaggle_spark.streaming.update_mode import (
        store_day_category_counts,
        streaming_day_categories_update_mode,
    )

    def key(r):
        return (
            str(r["day"]), r["event_type"], r["c_ref"], r["c_cmp"],
            r["n_ref"], r["n_cmp"],
            None if r["psi_term"] is None else round(r["psi_term"], 9),
        )

    expected = sorted(key(r) for r in s17_stream_psi(spark, SF).collect())
    assert expected

    ev = load_table(spark, SF, "events")
    ref_counts = (
        ev.filter(F.col("ts_nanos") < F.lit(PSI_SPLIT_NS))
        .groupBy(F.col("event_type").alias("cat"))
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    src = tempfile.mkdtemp(prefix="updpsi_src_")
    ckpt = tempfile.mkdtemp(prefix="updpsi_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    store = ClosingDayStore(allowed_lateness_days=2)

    def run_round():
        q = streaming_day_categories_update_mode(
            spark, src, store, ckpt, since_nanos=PSI_SPLIT_NS
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    try:
        # stop/restart mid-corpus: committed batches must not replay
        # into the persistent store (ClosingDayStore batch_id dedup)
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        run_round()
        assert store.data  # half-corpus snapshot landed
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        run_round()
        got = sorted(
            key(r)
            for r in psi_day_table(
                store_day_category_counts(spark, store), ref_counts
            )
            .withColumnRenamed("cat", "event_type")
            .collect()
        )
        assert got == expected
        assert store.rejected == 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_closing_day_store_replayed_batch_is_idempotent():
    """foreachBatch is at-least-once: a replayed (same batch_id) batch
    must not double-count rejections or re-apply upserts."""
    import datetime as dt

    store = ClosingDayStore(allowed_lateness_days=1)
    d = dt.date(2024, 1, 10)
    store.apply_batch([(d, "a", 1), (d + dt.timedelta(5), "a", 2)],
                      batch_id=0)
    late = [
        (d - dt.timedelta(3), "a", 9),       # behind cutoff: rejected
        (d + dt.timedelta(5), "a", 7),       # on-time: applied
    ]
    store.apply_batch(late, batch_id=1)
    assert store.rejected == 1
    snap = dict(store.data)
    store.apply_batch(late, batch_id=1)  # replay: skipped wholesale
    assert store.rejected == 1 and store.data == snap
    # direct calls (batch_id=None) keep the original semantics
    store.apply_batch(late)
    assert store.rejected == 2


def test_closing_day_store_dedup_is_per_run_key():
    """The epoch dedup is keyed (run_key, batch_id) like Delta's
    (queryId, epochId) txn version: a store shared by two queries
    (distinct checkpoints) must not drop the second query's epoch 0
    because the first already applied its own epoch 0 — and skipped
    replays are counted, never silent."""
    import datetime as dt

    store = ClosingDayStore(allowed_lateness_days=2)
    d = dt.date(2024, 3, 1)
    store.apply_batch([(d, "a", 1)], batch_id=0, run_key="ckpt/q1")
    # second query, same epoch number: must APPLY, not dedup
    store.apply_batch([(d, "b", 2)], batch_id=0, run_key="ckpt/q2")
    assert store.data[(str(d), "b")] == 2
    assert store.skipped_batches == 0
    # true replay within one run: skipped AND counted
    store.apply_batch([(d, "b", 99)], batch_id=0, run_key="ckpt/q2")
    assert store.data[(str(d), "b")] == 2
    assert store.skipped_batches == 1
    # each run's high-water mark advances independently
    store.apply_batch([(d, "a", 3)], batch_id=1, run_key="ckpt/q1")
    store.apply_batch([(d, "b", 4)], batch_id=1, run_key="ckpt/q2")
    assert store.last_batch_id == {"ckpt/q1": 1, "ckpt/q2": 1}


def test_update_mode_ks_family_matches_batch_twin(spark):
    """The KS family through the deployment shape: the day-bucket
    store (since the KS comparison window's split) lifted through the
    shared ks_day_table kernel equals the s18 batch twin."""
    from m5_competition_kaggle_spark.queries.extensions_r8c import (
        KS_SPLIT_NS,
        s18_stream_ks,
    )
    from m5_competition_kaggle_spark.streaming.ks_monitor import (
        ks_day_table,
    )
    from m5_competition_kaggle_spark.streaming.update_mode import (
        store_day_counts,
    )

    def key(r):
        return (
            str(r["day"]), r["n_ref"], r["n_cmp"], r["q_at"],
            r["d_num"], r["d_den"], r["ks_permille"],
        )

    expected = sorted(key(r) for r in s18_stream_ks(spark, SF).collect())
    assert expected

    ev = load_table(spark, SF, "events")
    ref_counts = (
        ev.filter(F.col("ts_nanos") < F.lit(KS_SPLIT_NS))
        .groupBy(F.expr("CAST(round(value) AS BIGINT)").alias("q"))
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    src = tempfile.mkdtemp(prefix="updks_src_")
    ckpt = tempfile.mkdtemp(prefix="updks_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    store = ClosingDayStore(allowed_lateness_days=2)
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        q = streaming_day_buckets_update_mode(
            spark, src, store, ckpt, since_nanos=KS_SPLIT_NS,
            maxFilesPerTrigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            key(r)
            for r in ks_day_table(
                store_day_counts(spark, store), ref_counts
            ).collect()
        )
        assert got == expected
        assert store.rejected == 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
