"""Structured Streaming tests: the batch-checked plans running as real
streams (file source → memory sink), plus session-boundary semantics."""

import datetime

from m5_competition_kaggle_spark.sources.catalog import SCHEMAS
from m5_competition_kaggle_spark.streaming.events import (
    session_aggregate,
    streaming_tumbling_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def test_streaming_matches_batch(spark):
    """The SAME tumbling plan through readStream must equal batch output."""
    from m5_competition_kaggle_spark.sources.catalog import load_table

    batch = tumbling_counts(load_table(spark, SF, "events"), "1 hour")
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }

    # file-source streams read a directory; stage the single parquet file
    import os
    import shutil
    import tempfile

    src_dir = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{SF}/events.parquet", os.path.join(src_dir, "part-0.parquet"))

    stream = streaming_tumbling_counts(spark, src_dir, "1 hour", "2 hours")
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_stream_static_enrich_matches_batch(spark):
    """Stream-static join: the streamed events enriched by a static
    (batch) dimension must equal the batch twin row-for-row."""
    from pyspark.sql import functions as F

    from m5_competition_kaggle_spark.sources.catalog import load_table
    from m5_competition_kaggle_spark.streaming.events import (
        enrich_with_static,
        read_events_stream,
    )

    ev = load_table(spark, SF, "events")
    dim = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_n"), F.avg("value").alias("type_avg")
    )
    batch = enrich_with_static(
        ev.select("event_id", "event_type", "value"), dim
    )
    expected = {
        r["event_id"]: (r["type_n"], round(r["type_avg"], 9))
        for r in batch.collect()
    }

    import os
    import shutil
    import tempfile

    src_dir = tempfile.mkdtemp(prefix="events_enrich_")
    shutil.copy(f"{SF}/events.parquet", os.path.join(src_dir, "part-0.parquet"))
    stream = enrich_with_static(
        read_events_stream(spark, src_dir).select(
            "event_id", "event_type", "value"
        ),
        dim,
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["event_id"]: (r["type_n"], round(r["type_avg"], 9))
            for r in spark.sql("SELECT * FROM enrich_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_events_raw_schema_fallback_is_narrow(spark, tmp_path):
    """The pre-data fallback covers ONLY un-sniffable sources (empty dir
    / missing path); a corrupt footer must raise, not silently hand a
    stream the default schema (r3 advice, catalog.py)."""
    import pytest

    from m5_competition_kaggle_spark.sources.catalog import (
        EVENTS_RAW_DEFAULT,
        events_raw_schema,
    )

    empty = tmp_path / "empty"
    empty.mkdir()
    assert events_raw_schema(spark, str(empty)) == EVENTS_RAW_DEFAULT
    assert (
        events_raw_schema(spark, str(tmp_path / "missing"))
        == EVENTS_RAW_DEFAULT
    )
    with pytest.raises(Exception):
        events_raw_schema(spark, str(tmp_path / "missing"), default=None)

    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-0.parquet").write_bytes(b"PAR1 this is not a footer")
    with pytest.raises(Exception):
        events_raw_schema(spark, str(corrupt))


def test_session_window_boundary_semantics(spark):
    """An event exactly gap after the previous one MERGES into the session;
    only strictly-later events start a new one — pins the semantics the s3
    oracle replicates with `ts > lag(ts) + gap`."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    mins = lambda m: t0 + datetime.timedelta(minutes=m)  # noqa: E731
    rows = [
        (1, mins(0), 1, "a", 1.0, None),
        (2, mins(29), 1, "a", 1.0, None),   # < 30m after prev: same session
        (3, mins(59), 1, "a", 1.0, None),   # exactly 30m after: still merges
        (4, mins(90), 1, "a", 1.0, None),   # 31m after prev: NEW session
        (5, mins(200), 1, "a", 1.0, None),  # isolated session
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = session_aggregate(df, "30 minutes").orderBy("session_start").collect()
    assert [(r["session_start"], r["n_events"]) for r in out] == [
        (mins(0), 3),
        (mins(90), 1),
        (mins(200), 1),
    ]
