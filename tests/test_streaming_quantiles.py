"""Streaming quantile trajectory (streaming/quantile_monitor.py):
the monitor over a real file-source stream must emit the SAME
per-day p50/p95/p99 table as the certified batch twin (s20),
including across a multi-file stream where a day's bucket counts
straddle trigger batches."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries.extensions_r8f import (
    s20_stream_quantiles,
)
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.quantile_monitor import (
    streaming_quantile_trajectory,
)

SF = "/root/testdata/sf0.001"

NS_PER_DAY = 86_400_000_000_000


def _row_key(r):
    return (str(r.day), r.n, r.q500, r.q950, r.q990)


def _run_monitor(spark, source_dir, **source_options):
    sink: list = []
    ckpt = tempfile.mkdtemp(prefix="quant_ckpt_")
    q = streaming_quantile_trajectory(
        spark, source_dir, sink, ckpt, **source_options
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return sorted(_row_key(r) for r in sink)


def _batch_expected(spark):
    return sorted(
        _row_key(r)
        for r in s20_stream_quantiles(spark, SF).collect()
    )


def test_stream_equals_batch_trajectory(spark):
    d = tempfile.mkdtemp(prefix="events_quant_stream_")
    shutil.copy(
        f"{SF}/events.parquet", os.path.join(d, "part-0.parquet")
    )
    try:
        got = _run_monitor(spark, d)
        expected = _batch_expected(spark)
        assert expected, "batch twin produced no rows"
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_incremental_files_converge(spark):
    d = tempfile.mkdtemp(prefix="events_quant_stream2_")
    try:
        ev = load_table(spark, SF, "events")
        lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
        mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
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
