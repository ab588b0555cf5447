"""Checkpoint recovery for the PSI / KS / quantile monitors: stop the
trajectory mid-corpus, restart from the SAME checkpoint with the rest
of the files staged, and the recovered day-cell state must integrate
the old — the final snapshot equals the certified batch twin over
everything. The split lands MID-day so the restarted run must merge
recovered per-day state with new rows, not just append fresh days.
Completes the recovery matrix started by
tests/test_streaming_welch_recovery.py (s19) for s17/s18/s20."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries.extensions_r8b import (
    PSI_SPLIT_NS,
    s17_stream_psi,
)
from m5_competition_kaggle_spark.queries.extensions_r8c import (
    KS_SPLIT_NS,
    s18_stream_ks,
)
from m5_competition_kaggle_spark.queries.extensions_r8f import (
    s20_stream_quantiles,
)
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.ks_monitor import (
    streaming_ks_trajectory,
)
from m5_competition_kaggle_spark.streaming.psi_monitor import (
    streaming_psi_trajectory,
)
from m5_competition_kaggle_spark.streaming.quantile_monitor import (
    streaming_quantile_trajectory,
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


def _recovery_roundtrip(spark, run_round, expected, mid_nanos):
    """Stage the first half, run; stage the rest, run from the SAME
    checkpoint; the second snapshot must equal the batch twin."""
    ev = load_table(spark, SF, "events")
    src = tempfile.mkdtemp(prefix="mon_recovery_src_")
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid_nanos), src, "a")
        first = run_round(src)
        assert first and first != expected  # half-corpus snapshot
        _stage(ev.filter(F.col("ts_nanos") >= mid_nanos), src, "b")
        assert run_round(src) == expected
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _drain(q, sink, key):
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sorted(key(r) for r in sink)


def test_psi_state_survives_restart(spark):
    key = lambda r: (  # noqa: E731
        str(r.day), r[1], r.c_ref, r.c_cmp, r.n_ref, r.n_cmp,
        None if r.psi_term is None else round(r.psi_term, 12),
    )
    expected = sorted(
        key(r) for r in s17_stream_psi(spark, SF).collect()
    )
    assert expected
    ref = (
        load_table(spark, SF, "events")
        .filter(F.col("ts_nanos") < F.lit(PSI_SPLIT_NS))
        .groupBy(F.col("event_type").alias("cat"))
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    ckpt = tempfile.mkdtemp(prefix="psi_recovery_ckpt_")

    def run_round(src):
        sink: list = []
        q = streaming_psi_trajectory(
            spark, src, ref, PSI_SPLIT_NS, sink, ckpt
        )
        return _drain(q, sink, key)

    try:
        _recovery_roundtrip(
            spark, run_round, expected,
            PSI_SPLIT_NS + 7 * NS_PER_DAY + NS_PER_DAY // 2,
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_ks_state_survives_restart(spark):
    key = lambda r: (  # noqa: E731
        str(r.day), r.n_ref, r.n_cmp, r.q_at, r.d_num, r.d_den,
        r.ks_permille,
    )
    expected = sorted(
        key(r) for r in s18_stream_ks(spark, SF).collect()
    )
    assert expected
    ref = (
        load_table(spark, SF, "events")
        .filter(F.col("ts_nanos") < F.lit(KS_SPLIT_NS))
        .groupBy(F.expr("CAST(round(value) AS BIGINT)").alias("q"))
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    ckpt = tempfile.mkdtemp(prefix="ks_recovery_ckpt_")

    def run_round(src):
        sink: list = []
        q = streaming_ks_trajectory(
            spark, src, ref, KS_SPLIT_NS, sink, ckpt
        )
        return _drain(q, sink, key)

    try:
        _recovery_roundtrip(
            spark, run_round, expected,
            KS_SPLIT_NS + 7 * NS_PER_DAY + NS_PER_DAY // 2,
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_quantile_state_survives_restart(spark):
    key = lambda r: (str(r.day), r.n, r.q500, r.q950, r.q990)  # noqa: E731
    expected = sorted(
        key(r) for r in s20_stream_quantiles(spark, SF).collect()
    )
    assert expected
    lo = (
        load_table(spark, SF, "events")
        .agg(F.min("ts_nanos"))
        .collect()[0][0]
    )
    ckpt = tempfile.mkdtemp(prefix="quant_recovery_ckpt_")

    def run_round(src):
        sink: list = []
        q = streaming_quantile_trajectory(spark, src, sink, ckpt)
        return _drain(q, sink, key)

    try:
        _recovery_roundtrip(
            spark, run_round, expected,
            lo + 15 * NS_PER_DAY + NS_PER_DAY // 2,
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
