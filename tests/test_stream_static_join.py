"""Stream-static enrichment join + crash-resume semantics."""

import os
import shutil

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import SCHEMAS, load_table

SF = "/root/testdata/sf0.001"


def test_stream_static_enrichment_join(spark, tmp_path):
    """Enrich a streaming fact with a static dimension — the standard
    lookup pattern; the static side broadcasts into every micro-batch."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{SF}/events.parquet", os.path.join(src, "p0.parquet"))

    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 10.0), ("view", 0.5),
         ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    from m5_competition_kaggle_spark.streaming.events import (
        read_events_stream,
    )

    stream = read_events_stream(spark, src)
    enriched = (
        stream.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value") * F.col("weight")).alias("weighted"),
        )
    )
    q = (
        enriched.writeStream.outputMode("complete")
        .format("memory").queryName("enriched_out").start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["event_type"]: r["n"]
            for r in spark.sql("SELECT * FROM enriched_out").collect()
        }
    finally:
        q.stop()

    batch_counts = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == batch_counts


def test_run_stage_recomputes_partial_write(spark, tmp_path):
    """A stage directory WITHOUT the _SUCCESS marker (crashed mid-write)
    must be recomputed, not trusted."""
    from m5_competition_kaggle_spark.sources import io

    path = str(tmp_path / "stage")
    calls = []

    def build():
        calls.append(1)
        return spark.range(10).withColumnRenamed("id", "k")

    out = io.run_stage(spark, path, build)
    assert out.count() == 10 and len(calls) == 1

    # memoized: no recompute
    io.run_stage(spark, path, build)
    assert len(calls) == 1

    # simulate crash: drop the marker, keep partial files
    os.remove(os.path.join(path, "_SUCCESS"))
    io.run_stage(spark, path, build)
    assert len(calls) == 2
    assert io.stage_done(path)
