"""Streaming CMS (streaming/sketches.py): the live sketch over a real
file-source stream must equal the batch cells bit-for-bit, and keep
its state bounded at D·W cells.
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.cms import (
    CMS_D,
    CMS_W,
    cms_build,
    cms_estimate,
)
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.sketches import (
    streaming_cms_cells,
)

SF = "/root/testdata/sf0.001"


def _staged_dir():
    d = tempfile.mkdtemp(prefix="events_cms_stream_")
    shutil.copy(f"{SF}/events.parquet", os.path.join(d, "part-0.parquet"))
    return d


def test_stream_equals_batch_cells(spark):
    batch = cms_build(
        load_table(spark, SF, "events").select(
            F.col("user_id").cast("string").alias("__item")
        ),
        "__item",
    )
    expected = sorted(map(tuple, batch.collect()))
    assert 0 < len(expected) <= CMS_D * CMS_W

    stream = streaming_cms_cells(spark, _staged_dir())
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_cells_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            map(tuple, spark.sql("SELECT * FROM cms_cells_out").collect())
        )
    finally:
        q.stop()
    assert got == expected


def test_windowed_stream_equals_batch(spark):
    """Per-event-time-hour CMS cells: the watermarked streaming agg
    must equal the batch twin bit for bit."""
    from m5_competition_kaggle_spark.streaming.sketches import (
        streaming_windowed_cms_cells,
        windowed_cms_cells,
    )

    batch = windowed_cms_cells(
        load_table(spark, SF, "events"), "user_id", "1 hour"
    )
    expected = sorted(map(tuple, batch.collect()))
    assert expected
    stream = streaming_windowed_cms_cells(
        spark, _staged_dir(), "user_id", "1 hour"
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("wcms_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            map(tuple, spark.sql("SELECT * FROM wcms_out").collect())
        )
    finally:
        q.stop()
    assert got == expected


def test_live_sketch_serves_estimates(spark):
    """The serving pattern: estimates against the streamed cell table
    overestimate-never-underestimate the true per-user event counts."""
    ev = load_table(spark, SF, "events")
    stream = streaming_cms_cells(spark, _staged_dir())
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_serving")
        .start()
    )
    try:
        q.processAllAvailable()
        cells = spark.sql("SELECT * FROM cms_serving")
        exact = ev.groupBy(
            F.col("user_id").cast("string").alias("__item")
        ).agg(F.count(F.lit(1)).alias("exact"))
        est = cms_estimate(cells, exact.select("__item"), "__item")
        joined = exact.join(est, "__item").collect()
    finally:
        q.stop()
    assert joined and all(r["est_cnt"] >= r["exact"] for r in joined)
