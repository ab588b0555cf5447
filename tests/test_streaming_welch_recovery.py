"""Welch-monitor checkpoint recovery: stop the streaming trajectory
mid-corpus, restart from the SAME checkpoint with the rest of the
files staged, and the recovered sufficient-stat state must integrate
the old — the final per-day t² table equals the batch twin over
everything. Complements tests/test_streaming_welch.py (which proves
stream == batch without a restart)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries.extensions_r8d import (
    s19_stream_welch,
)
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.welch_monitor import (
    streaming_welch_trajectory,
)

SF = "/root/testdata/sf0.001"

NS_PER_DAY = 86_400_000_000_000


def _row_key(r):
    return (
        str(r.day), r.event_type, r.n_a, r.n_b, r.sum_a, r.sum_b,
        r.ss_a, r.ss_b,
        None if r.welch_t2 is None else round(r.welch_t2, 9),
    )


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


def test_welch_state_survives_restart(spark):
    ev = load_table(spark, SF, "events")
    expected = sorted(
        _row_key(r) for r in s19_stream_welch(spark, SF).collect()
    )
    assert expected

    src = tempfile.mkdtemp(prefix="welch_recovery_src_")
    ckpt = tempfile.mkdtemp(prefix="welch_recovery_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2  # mid-day split:
    # day 15's stats arrive across BOTH runs, so the restart must
    # merge recovered state with new rows, not just append days
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")

        def run_round():
            sink: list = []
            q = streaming_welch_trajectory(spark, src, sink, ckpt)
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            return sorted(_row_key(r) for r in sink)

        first = run_round()
        assert first and first != expected  # half-corpus snapshot

        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        assert run_round() == expected
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
