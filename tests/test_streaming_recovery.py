"""Stateful-aggregate checkpoint recovery: stop a streaming query mid-
corpus, restart from the SAME checkpoint over new files, and the
recovered state must integrate the old — final result equals the batch
over everything. This is the guarantee test_streaming_sink's restart
no-op doesn't cover (there the state is the SINK's; here it is the
aggregation state itself surviving the restart)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.cms import cms_build
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.sketches import (
    streaming_cms_cells,
)

SF = "/root/testdata/sf0.001"


def test_agg_state_survives_restart(spark):
    ev = load_table(spark, SF, "events")
    batch = cms_build(
        ev.select(F.col("user_id").cast("string").alias("__item")),
        "__item",
    )
    expected = sorted(map(tuple, batch.collect()))
    assert expected

    src = tempfile.mkdtemp(prefix="events_recovery_src_")
    ckpt = tempfile.mkdtemp(prefix="events_recovery_ckpt_")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    try:
        # phase 1: only half the corpus visible
        half_a.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "a"))
        # the file source watches src/*/  — stage via subdirs' files
        for f in os.listdir(os.path.join(src, "a")):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(src, "a", f),
                            os.path.join(src, "part-a.parquet"))
        shutil.rmtree(os.path.join(src, "a"))

        def run_round():
            stream = streaming_cms_cells(spark, src)
            q = (
                stream.writeStream.outputMode("complete")
                .option("checkpointLocation", ckpt)
                .format("memory")
                .queryName("recovery_out")
                .start()
            )
            try:
                q.processAllAvailable()
                return sorted(map(
                    tuple,
                    spark.sql("SELECT * FROM recovery_out").collect()))
            finally:
                q.stop()

        first = run_round()
        assert first != expected  # genuinely partial state at stop

        # phase 2: second half arrives while the query is DOWN; restart
        # from the same checkpoint must resume, not recompute-from-zero
        # nor double-count the first half.
        half_b.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "b"))
        for f in os.listdir(os.path.join(src, "b")):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(src, "b", f),
                            os.path.join(src, "part-b.parquet"))
        shutil.rmtree(os.path.join(src, "b"))

        second = run_round()
        assert second == expected
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
