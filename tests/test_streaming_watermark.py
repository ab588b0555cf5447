"""Watermark semantics: late events beyond the delay are dropped, on-time
windows finalize exactly once (append mode) — the state-bounding contract
that makes streaming aggs viable at scale."""

import datetime
import os

from pyspark.sql import functions as F

SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_watermark_drops_late_events(spark, tmp_path):
    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    src = str(tmp_path / "src")
    os.makedirs(src)

    # batch 1: four events in [10:00,11:00), one at 13:00 that will push
    # the watermark to 12:00 (max event time − 1h delay)
    _write_batch(
        spark,
        [
            (1, t(10, 0), 1, 1.0),
            (2, t(10, 10), 1, 1.0),
            (3, t(10, 20), 2, 1.0),
            (4, t(10, 30), 2, 1.0),
            (5, t(13, 0), 1, 1.0),
        ],
        src,
    )
    # distinct mtimes → distinct micro-batches (file source orders by
    # modification time; same-ms writes can merge into one batch)
    import time

    time.sleep(1.1)

    # batch 2: advances the watermark to 13:00 (the watermark a batch
    # FILTERS with is the one computed after the previous batch, so the
    # late-drop only engages for data arriving after this batch)
    _write_batch(spark, [(6, t(14, 0), 2, 1.0)], src)
    time.sleep(1.1)

    # batch 3: a LATE event for the long-finalized 10:00 window (must be
    # dropped), plus 16:00 so the 13:00/14:00 windows finalize too
    _write_batch(
        spark,
        [
            (7, t(10, 5), 1, 99.0),
            (8, t(16, 0), 2, 1.0),
        ],
        src,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("window.start").alias("ws"), "n", "total")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r["ws"]: (r["n"], r["total"])
                for r in spark.sql("SELECT * FROM wm_out").collect()}
    finally:
        q.stop()

    # the 10:00 window finalized from batch 1 alone — the late event
    # (value 99) was dropped, not merged and not re-emitted
    assert rows[t(10)] == (4, 4.0)
    # later windows finalized once the watermark passed their end
    assert rows[t(13)] == (1, 1.0)
    assert rows[t(14)] == (1, 1.0)
    # the late event's value appears nowhere
    assert all(total < 99 for _, total in rows.values())
