"""Kill-and-resume for the two state-store types the recovery matrix
did not yet cover (r13): stream-stream JOIN state (s7's funnel shape)
and dropDuplicates state (s6's dedup shape). The synthetic corpus is
staged so the post-restart file can only produce correct output if the
pre-restart state was RECOVERED from the checkpoint:

- every purchase in file B matches a view that arrived ONLY in file A
  (a join whose left-side state reset would emit zero matches);
- file B repeats (user, type, hour-window) keys whose first arrival
  was in file A (a dedup whose state reset would re-emit them).

File sink + shared checkpoint, the cusum-recovery mechanics
(append-mode memory sinks cannot recover from a checkpoint)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
    streaming_funnel_join,
)

NS_MIN = 60_000_000_000
NS_DAY = 86_400_000_000_000
BASE = 20_000 * NS_DAY  # corpus epoch-day anchor


def _stage(spark, rows, src, name):
    """rows: (event_id, ts_nanos, user_id, event_type)."""
    df = spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, ts, u, et in rows],
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    )
    tmp = os.path.join(src, "__tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(tmp, f), os.path.join(src, name))
    shutil.rmtree(tmp)


FILE_A = [
    # views the post-restart purchases must join against
    *[(100 + u, BASE + u * 5 * NS_MIN, u, "view") for u in (1, 2, 3, 4)],
    # first arrivals of the dedup keys file B repeats
    *[(200 + u, BASE + u * 5 * NS_MIN, u, "click") for u in (1, 2, 3, 4)],
]
FILE_B = [
    # purchases 30 min after file A's views (inside the 1 h horizon)
    *[
        (300 + u, BASE + (u * 5 + 30) * NS_MIN, u, "purchase")
        for u in (1, 2, 3, 4)
    ],
    # duplicates: same (user, click, window) as file A's clicks
    *[
        (400 + u, BASE + (u * 5 + 20) * NS_MIN, u, "click")
        for u in (1, 2)
    ],
    # one genuinely new key
    (450, BASE + 25 * NS_MIN, 9, "click"),
]


def test_stream_stream_join_state_survives_restart(spark):
    """Run the funnel join on file A only (zero matches possible),
    stop, stage file B, restart from the SAME checkpoint: every
    purchase must match its file-A view — impossible unless the
    left side's join state was recovered, not rebuilt from B."""
    src = tempfile.mkdtemp(prefix="funnel_rec_src_")
    ckpt = tempfile.mkdtemp(prefix="funnel_rec_ckpt_")
    sink = tempfile.mkdtemp(prefix="funnel_rec_out_")

    def run_round():
        stream = streaming_funnel_join(
            spark, src, horizon="1 hour", watermark="2 hours"
        )
        q = (
            stream.writeStream.outputMode("append")
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
            (r["first_user"], r["first_id"], r["next_id"])
            for r in spark.read.parquet(sink).collect()
        }

    try:
        _stage(spark, FILE_A, src, "part-a.parquet")
        first = run_round()
        assert first == set()  # no purchases yet
        _stage(spark, FILE_B, src, "part-b.parquet")
        got = run_round()
        assert got == {(u, 100 + u, 300 + u) for u in (1, 2, 3, 4)}
    finally:
        for d in (src, ckpt, sink):
            shutil.rmtree(d, ignore_errors=True)


def test_drop_duplicates_state_survives_restart(spark):
    """Run the s6 dedup shape on file A, stop, stage file B (which
    repeats two of A's (user, click, window) keys), restart from the
    SAME checkpoint: the repeated keys must NOT re-emit (recovered
    dedup state), the genuinely new keys must."""
    src = tempfile.mkdtemp(prefix="dedup_rec_src_")
    ckpt = tempfile.mkdtemp(prefix="dedup_rec_ckpt_")
    sink = tempfile.mkdtemp(prefix="dedup_rec_out_")

    def run_round():
        stream = read_events_stream(spark, src)
        deduped = (
            stream.withWatermark("ts", "2 hours")
            .withColumn("window_start", F.window("ts", "1 hour")["start"])
            .dropDuplicates(["user_id", "event_type", "window_start"])
        )
        q = (
            deduped.select("event_id", "user_id", "event_type")
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", sink)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return [
            (r["event_id"], r["user_id"], r["event_type"])
            for r in spark.read.parquet(sink).collect()
        ]

    try:
        _stage(spark, FILE_A, src, "part-a.parquet")
        first = run_round()
        assert len(first) == len(FILE_A)  # all 8 keys distinct in A
        _stage(spark, FILE_B, src, "part-b.parquet")
        combined = run_round()
        emitted_ids = sorted(eid for eid, _, _ in combined)
        # A's 8 rows + B's 4 purchases + B's 1 new click; the two
        # repeated click keys (ids 401/402) suppressed by recovered
        # state — a reset would re-emit them as first-arrivals.
        assert emitted_ids == sorted(
            [e for e, *_ in FILE_A]
            + [300 + u for u in (1, 2, 3, 4)]
            + [450]
        )
        # exactly one row per (user, type) key across both runs
        keys = [(u, t) for _, u, t in combined]
        assert len(keys) == len(set(keys))
    finally:
        for d in (src, ckpt, sink):
            shutil.rmtree(d, ignore_errors=True)
