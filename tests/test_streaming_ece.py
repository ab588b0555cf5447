"""Streaming daily ECE monitor (streaming/ece_monitor.py): the
calibration member of the monitor family. Pins:

1. the update-mode deployment (day-bin sufficient-stat cells merged
   into the ClosingDayStore) re-assembles, through the SAME
   ece_day_table kernel, to exactly the batch daily-ECE table;
2. the kernel's telescoped integers against the certified batch
   operator (operators/ece.py) on the same day's rows;
3. state boundedness: the per-day cell count never exceeds the
   score-domain/bin_width cap the docstring claims."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.ece import (
    expected_calibration_error,
)
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.ece_monitor import (
    day_bin_stats,
    ece_day_table,
    store_day_bin_stats,
    streaming_day_ece_update_mode,
)
from m5_competition_kaggle_spark.streaming.update_mode import (
    ClosingDayStore,
)

SF = "/root/testdata/sf0.001"
NS_PER_DAY = 86_400_000_000_000
SCORE = "least(CAST(round(value * 10) AS BIGINT), 1000L)"


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


def _key(r):
    return (
        str(r["day"]), r["n"], r["n_bins"], r["abs_dev_sum"],
        r["ece_ppm"], r["mce_permille"],
    )


def test_kernel_matches_batch_ece_operator(spark):
    """Per-day cells through ece_day_table == the certified batch ECE
    operator run day-by-day on the raw rows — same telescoped
    integers, two entries."""
    ev = load_table(spark, SF, "events")
    cells = day_bin_stats(ev, score_expr=SCORE, bin_width=10)
    via_cells = {
        str(r["day"]): (r["n"], r["abs_dev_sum"], r["ece_ppm"],
                        r["mce_permille"])
        for r in ece_day_table(cells).collect()
    }
    assert len(via_cells) == 30
    # spot-check three days against the row-level operator
    days = sorted(via_cells)[:3]
    for day in days:
        rows = ev.filter(
            F.col("ts").cast("date") == F.lit(day).cast("date")
        )
        r = expected_calibration_error(
            rows,
            F.expr(SCORE),
            F.col("event_type") == "purchase",
            bin_width=10,
        ).collect()[0]
        assert via_cells[day] == (
            r["n"], r["abs_dev_sum"], r["ece_ppm"], r["mce_permille"]
        ), day


def test_update_mode_stream_matches_batch_table(spark):
    ev = load_table(spark, SF, "events")
    expected = sorted(
        _key(r)
        for r in ece_day_table(
            day_bin_stats(ev, score_expr=SCORE, bin_width=10)
        ).collect()
    )
    assert expected

    src = tempfile.mkdtemp(prefix="ecemon_src_")
    ckpt = tempfile.mkdtemp(prefix="ecemon_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    store = ClosingDayStore(allowed_lateness_days=2)
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        q = streaming_day_ece_update_mode(
            spark, src, store, ckpt,
            score_expr=SCORE, bin_width=10, maxFilesPerTrigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            _key(r)
            for r in ece_day_table(
                store_day_bin_stats(spark, store)
            ).collect()
        )
        assert got == expected
        assert store.rejected == 0
        # bounded state: capped permille domain / bin width + 1
        per_day: dict = {}
        for (d, b) in store.data:
            per_day[d] = per_day.get(d, 0) + 1
        assert max(per_day.values()) <= 101
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_update_mode_survives_restart_with_persistent_store(spark):
    """Kill-and-resume over the SAME checkpoint dir and store (the
    s17–s21 recovery standard, r12 VERDICT item 6): stop after the
    first file, restart, and the second run must only add the
    remaining deltas — recovered day-bin state integrates the old, no
    reset-to-zero, no double-processing (store.apply_batch dedups by
    (run_key, batch_id), so a replayed trigger is idempotent)."""
    ev = load_table(spark, SF, "events")
    expected = sorted(
        _key(r)
        for r in ece_day_table(
            day_bin_stats(ev, score_expr=SCORE, bin_width=10)
        ).collect()
    )
    src = tempfile.mkdtemp(prefix="ecemon2_src_")
    ckpt = tempfile.mkdtemp(prefix="ecemon2_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    # split mid-day so the restarted run must MERGE recovered per-day
    # state with new rows for the same day, not just append fresh days
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    store = ClosingDayStore(allowed_lateness_days=2)
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        q = streaming_day_ece_update_mode(
            spark, src, store, ckpt,
            score_expr=SCORE, bin_width=10, maxFilesPerTrigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        partial = sorted(
            _key(r)
            for r in ece_day_table(
                store_day_bin_stats(spark, store)
            ).collect()
        )
        assert partial and partial != expected
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        q = streaming_day_ece_update_mode(
            spark, src, store, ckpt,
            score_expr=SCORE, bin_width=10, maxFilesPerTrigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            _key(r)
            for r in ece_day_table(
                store_day_bin_stats(spark, store)
            ).collect()
        )
        assert got == expected
        assert store.rejected == 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
