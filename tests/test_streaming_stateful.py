"""applyInPandasWithState: state must accumulate ACROSS micro-batches and
end equal to the batch EWMA/totals over the same data."""

import os
import shutil

import pytest

from m5_competition_kaggle_spark.sources.catalog import SCHEMAS, load_table
from m5_competition_kaggle_spark.streaming.stateful import stateful_user_totals

SF = "/root/testdata/sf0.001"


@pytest.mark.filterwarnings("ignore")
def test_stateful_totals_across_microbatches(spark, tmp_path):
    from pyspark.sql import functions as F

    # split events into two files → two micro-batches (maxFilesPerTrigger=1)
    ev = load_table(spark, SF, "events")
    half1 = ev.filter(F.col("event_id") < 500)
    half2 = ev.filter(F.col("event_id") >= 500)
    src = tmp_path / "stream_src"
    os.makedirs(src)
    half1.select(
        "event_id", F.col("ts_nanos").alias("ts"), "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.mode("append").parquet(str(src))
    half2.select(
        "event_id", F.col("ts_nanos").alias("ts"), "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.mode("append").parquet(str(src))

    from m5_competition_kaggle_spark.streaming.events import (
        read_events_stream,
    )

    stream = read_events_stream(spark, str(src), maxFilesPerTrigger=1)
    out = stateful_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM stateful_out"
        ).toPandas()
    finally:
        q.stop()

    # progressed over >1 micro-batch
    assert rows.groupby("user_id").size().max() >= 2

    # final state per user == batch computation over all events
    final = rows.groupby("user_id").last()
    from m5_competition_kaggle_spark.operators.stateful import ewma_per_key

    batch = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in ewma_per_key(
            ev, "user_id", "value", ("ts_nanos", "event_id"), 0.5
        ).collect()
    }
    for uid, row in final.iterrows():
        n, ewma = batch[uid]
        assert row["n_events"] == n
        assert row["ewma"] == pytest.approx(ewma, rel=1e-12)

    shutil.rmtree(src, ignore_errors=True)
