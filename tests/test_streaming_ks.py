"""Streaming KS trajectory (streaming/ks_monitor.py): the monitor
over a real file-source stream must emit the SAME per-day KS table as
the certified batch twin (s18), including across a multi-file stream
where days straddle trigger batches, and the complete-mode aggregate
stays bounded at |days| x |value buckets|."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries.extensions_r8c import (
    KS_SPLIT_NS,
    s18_stream_ks,
)
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.ks_monitor import (
    streaming_ks_trajectory,
)

SF = "/root/testdata/sf0.001"


def _ref_counts(spark):
    return (
        load_table(spark, SF, "events")
        .filter(F.col("ts_nanos") < F.lit(KS_SPLIT_NS))
        .groupBy(F.expr("CAST(round(value) AS BIGINT)").alias("q"))
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )


def _run_monitor(spark, source_dir, **source_options):
    sink: list = []
    ckpt = tempfile.mkdtemp(prefix="ks_ckpt_")
    q = streaming_ks_trajectory(
        spark, source_dir, _ref_counts(spark), KS_SPLIT_NS, sink,
        ckpt, **source_options,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return sorted(
        (str(r.day), r.n_ref, r.n_cmp, r.q_at, r.d_num, r.d_den,
         r.ks_permille)
        for r in sink
    )


def _batch_expected(spark):
    return sorted(
        (str(r.day), r.n_ref, r.n_cmp, r.q_at, r.d_num, r.d_den,
         r.ks_permille)
        for r in s18_stream_ks(spark, SF).collect()
    )


def test_stream_equals_batch_trajectory(spark):
    d = tempfile.mkdtemp(prefix="events_ks_stream_")
    shutil.copy(f"{SF}/events.parquet", os.path.join(d, "part-0.parquet"))
    try:
        got = _run_monitor(spark, d)
        expected = _batch_expected(spark)
        assert expected, "batch twin produced no rows"
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_incremental_files_converge(spark):
    """Stage the events as TWO files arriving as separate stream
    batches: the final complete-mode snapshot must still equal the
    batch table (days straddling the file split get merged by the
    streaming agg's state, not double-counted)."""
    d = tempfile.mkdtemp(prefix="events_ks_stream2_")
    try:
        ev = load_table(spark, SF, "events")
        mid = KS_SPLIT_NS + 7 * 86_400_000_000_000
        (ev.filter(F.col("ts_nanos") < mid).coalesce(1)
         .write.mode("overwrite").parquet(os.path.join(d, "f1")))
        (ev.filter(F.col("ts_nanos") >= mid).coalesce(1)
         .write.mode("overwrite").parquet(os.path.join(d, "f2")))
        src = os.path.join(d, "src")
        os.makedirs(src)
        n = 0
        for sub in ("f1", "f2"):
            for f in os.listdir(os.path.join(d, sub)):
                if f.endswith(".parquet"):
                    shutil.copy(
                        os.path.join(d, sub, f),
                        os.path.join(src, f"part-{n}.parquet"),
                    )
                    n += 1
        assert n == 2
        got = _run_monitor(spark, src, maxFilesPerTrigger=1)
        assert got == _batch_expected(spark)
    finally:
        shutil.rmtree(d, ignore_errors=True)
