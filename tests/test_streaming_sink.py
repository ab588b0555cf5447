"""Exactly-once file sink (streaming/sinks.py): the foreachBatch +
batch_id-keyed overwrite recipe must (a) land every source row exactly
once, and (b) be a no-op on restart with the same checkpoint — the
replay-idempotence that makes the sink exactly-once end-to-end."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import SCHEMAS
from m5_competition_kaggle_spark.streaming.sinks import stream_to_parquet

SF = "/root/testdata/sf0.001"


def _stage_source() -> str:
    src_dir = tempfile.mkdtemp(prefix="events_sink_src_")
    shutil.copy(f"{SF}/events.parquet", os.path.join(src_dir, "part-0.parquet"))
    return src_dir


def test_sink_exactly_once_and_restart_idempotent(spark):
    src_dir = _stage_source()
    out_dir = tempfile.mkdtemp(prefix="events_sink_out_")
    ckpt_dir = tempfile.mkdtemp(prefix="events_sink_ckpt_")
    try:
        def start():
            from m5_competition_kaggle_spark.streaming.events import (
                read_events_stream,
            )

            stream = read_events_stream(spark, src_dir).select(
                "event_id", "user_id", "value"
            )
            return stream_to_parquet(stream, out_dir, ckpt_dir)

        q = start()
        q.awaitTermination()

        expected = spark.read.parquet(f"{SF}/events.parquet").count()
        got = spark.read.parquet(f"{out_dir}/batch_id=*")
        assert got.count() == expected
        assert got.select("event_id").distinct().count() == expected

        # restart with the same checkpoint: backlog already committed,
        # availableNow drains nothing, output unchanged
        q2 = start()
        q2.awaitTermination()
        assert spark.read.parquet(f"{out_dir}/batch_id=*").count() == expected

        # new source file -> only the delta lands, still no duplicates
        spark.read.parquet(f"{SF}/events.parquet").limit(10).withColumn(
            "event_id", F.col("event_id") + 10_000_000
        ).write.mode("overwrite").parquet(os.path.join(src_dir, "more"))
        shutil.move(
            os.path.join(src_dir, "more"),
            os.path.join(src_dir, "more_staged"),
        )
        for f in os.listdir(os.path.join(src_dir, "more_staged")):
            if f.endswith(".parquet"):
                shutil.move(
                    os.path.join(src_dir, "more_staged", f),
                    os.path.join(src_dir, f"part-1-{f}"),
                )
        q3 = start()
        q3.awaitTermination()
        final = spark.read.parquet(f"{out_dir}/batch_id=*")
        assert final.count() == expected + 10
        assert final.select("event_id").distinct().count() == expected + 10
    finally:
        for d in (src_dir, out_dir, ckpt_dir):
            shutil.rmtree(d, ignore_errors=True)
