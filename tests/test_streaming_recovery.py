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


def test_cusum_groupstate_survives_restart(spark):
    """applyInPandasWithState recovery: the (p, m) CUSUM state must be
    restored from the checkpoint across a full stop/start, so the
    union of both runs' append output equals the batch computation —
    no reset-to-zero, no double-processing."""
    from m5_competition_kaggle_spark.streaming.cusum_state import (
        batch_cusum,
        streaming_cusum,
    )
    from m5_competition_kaggle_spark.streaming.events import (
        read_events_stream,
    )

    ev = load_table(spark, SF, "events")
    prep = lambda df: df.select(  # noqa: E731
        "event_type", "event_id", F.col("ts_nanos").alias("tsn"),
        F.floor(F.col("value") * F.lit(1000)).cast("long").alias("v"),
    )
    expected = {
        r.event_id: r.cusum
        for r in batch_cusum(prep(ev), "event_type", "v", mu=100_000)
        .collect()
    }

    mid = ev.agg(
        F.expr("percentile_approx(ts_nanos, 0.5)").alias("m")
    ).collect()[0].m
    src = tempfile.mkdtemp(prefix="cusum_recovery_src_")
    ckpt = tempfile.mkdtemp(prefix="cusum_recovery_ckpt_")
    sink = tempfile.mkdtemp(prefix="cusum_recovery_out_")

    def stage(df, name):
        tmp = os.path.join(src, "__tmp")
        df.select(
            "event_id", F.col("ts_nanos").alias("ts"), "user_id",
            "event_type", "value", "props",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(tmp, f),
                            os.path.join(src, name))
        shutil.rmtree(tmp)

    def run_round():
        # a FILE sink (not memory: append-mode memory sinks cannot
        # recover from a checkpoint) — exactly-once via the same ckpt
        stream = read_events_stream(spark, src)
        out = streaming_cusum(prep(stream), "event_type", "v", mu=100_000)
        q = (
            out.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", sink)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {
            r.event_id: r.cusum
            for r in spark.read.parquet(sink)
            .select("event_id", "cusum")
            .collect()
        }

    try:
        stage(ev.filter(F.col("ts_nanos") < mid), "part-a.parquet")
        first = run_round()
        assert 0 < len(first) < len(expected)  # genuinely partial
        # second half arrives while the query is DOWN
        stage(ev.filter(F.col("ts_nanos") >= mid), "part-b.parquet")
        combined = run_round()
        # exactly-once across the restart: every input row appears once,
        # and the recovered (p, m) state CONTINUED the series (a reset
        # to zero would change every phase-2 cusum value)
        assert len(combined) == len(expected)
        assert combined == expected
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)


def test_anomaly_array_state_survives_restart(spark):
    """Same restart contract for the ARRAY-typed GroupState (the
    trailing-window value list of streaming_anomaly_flags): recovered
    window contents must produce exactly the batch flags."""
    from m5_competition_kaggle_spark.streaming.anomaly_state import (
        batch_anomaly_flags,
        streaming_anomaly_flags,
    )
    from m5_competition_kaggle_spark.streaming.events import (
        read_events_stream,
    )

    ev = load_table(spark, SF, "events")
    prep = lambda df: df.select(  # noqa: E731
        "event_type", "event_id", F.col("ts_nanos").alias("tsn"),
        F.floor(F.col("value") * F.lit(1000)).cast("long").alias("v"),
    )
    expected = {
        r.event_id: r.is_anomaly
        for r in batch_anomaly_flags(prep(ev), "event_type", "v").collect()
    }

    mid = ev.agg(
        F.expr("percentile_approx(ts_nanos, 0.5)").alias("m")
    ).collect()[0].m
    src = tempfile.mkdtemp(prefix="anom_recovery_src_")
    ckpt = tempfile.mkdtemp(prefix="anom_recovery_ckpt_")
    sink = tempfile.mkdtemp(prefix="anom_recovery_out_")

    def stage(df, name):
        tmp = os.path.join(src, "__tmp")
        df.select(
            "event_id", F.col("ts_nanos").alias("ts"), "user_id",
            "event_type", "value", "props",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(tmp, f),
                            os.path.join(src, name))
        shutil.rmtree(tmp)

    def run_round():
        stream = read_events_stream(spark, src)
        out = streaming_anomaly_flags(prep(stream), "event_type", "v")
        q = (
            out.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", sink)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return {
            r.event_id: r.is_anomaly
            for r in spark.read.parquet(sink)
            .select("event_id", "is_anomaly")
            .collect()
        }

    try:
        stage(ev.filter(F.col("ts_nanos") < mid), "part-a.parquet")
        first = run_round()
        assert 0 < len(first) < len(expected)
        stage(ev.filter(F.col("ts_nanos") >= mid), "part-b.parquet")
        combined = run_round()
        assert len(combined) == len(expected)
        assert combined == expected  # window contents restored exactly
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)
