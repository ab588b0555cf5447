"""Stop/restart checkpoint recovery for the applyInPandasWithState
twins (s28 transitions, s29 conversions) — the one recovery mode their
existing cross-microbatch tests don't drive: run over file A only, STOP
the query, stage file B, restart a NEW query from the SAME checkpoint,
and the GroupState restored from the state store must carry the
straddling pairs/firsts — combined emissions equal the certified batch
twins. Completes the recovery matrix (s17–s27 via the monitor-family
tests in test_streaming_*_recovery.py / test_r15_monitor_recovery.py /
test_r13_queue.py) for the two GroupState-backed twins."""

import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import (
    extensions_r16,
    extensions_r18,
)
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.events import (
    read_events_stream,
)

SF = "/root/testdata/sf0.001"


def _stage(df, d, name):
    tmp = os.path.join(d, f"__{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(tmp, f),
                os.path.join(d, f"part-{name}.parquet"),
            )
    shutil.rmtree(tmp)


def _drain(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_s28_groupstate_survives_restart(spark):
    from m5_competition_kaggle_spark.streaming.transition_state import (
        stateful_transitions,
    )

    ev = load_table(spark, SF, "events")
    expected = sorted(
        tuple(r)
        for r in extensions_r16.s28_stateful_transitions(
            spark, SF
        ).collect()
    )
    mid = ev.approxQuantile("ts_nanos", [0.5], 0.0)[0]
    # at least one user must straddle the stop/restart boundary, else
    # the recovered state is never exercised
    n_straddle = (
        ev.filter(F.col("ts_nanos") < mid)
        .select("user_id")
        .distinct()
        .join(
            ev.filter(F.col("ts_nanos") >= mid)
            .select("user_id")
            .distinct(),
            "user_id",
        )
        .count()
    )
    assert n_straddle > 0

    d = tempfile.mkdtemp(prefix="s28_restart_src_")
    ckpt = tempfile.mkdtemp(prefix="s28_restart_ckpt_")

    def run_round():
        # memory sink can't recover from a checkpoint — foreachBatch
        # (which can) collects each trigger's emissions instead
        sink: list = []
        stream = read_events_stream(
            spark, d, maxFilesPerTrigger=1
        ).select(
            "user_id",
            F.col("ts_nanos").alias("tsn"),
            "event_id",
            "event_type",
        )
        q = (
            stateful_transitions(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda bdf, bid: sink.extend(bdf.collect())
            )
            .start()
        )
        _drain(q)
        return sink

    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), d, "a")
        first = run_round()
        _stage(ev.filter(F.col("ts_nanos") >= mid), d, "b")
        second = run_round()
        # append mode: every pair emits exactly once across BOTH runs
        agg: dict = {}
        for r in first + second:
            k = (r.day, r.a, r.b)
            agg[k] = agg.get(k, 0) + 1
        got = sorted((d_, a, b, n) for (d_, a, b), n in agg.items())
        assert got == expected
        # the restarted run must have emitted the straddling pairs —
        # without recovered state they'd be missing, with replayed
        # files they'd double; both break the equality above, this
        # pins that run 2 did real work
        assert second
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_s29_groupstate_survives_restart(spark):
    from m5_competition_kaggle_spark.streaming.conversion_state import (
        stateful_user_conversions,
    )

    ev = load_table(spark, SF, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    expected = sorted(
        tuple(r)
        for r in extensions_r18.s29_user_conversions(
            spark, SF
        ).collect()
    )
    mid = ev.approxQuantile("ts_nanos", [0.5], 0.0)[0]
    d = tempfile.mkdtemp(prefix="s29_restart_src_")
    ckpt = tempfile.mkdtemp(prefix="s29_restart_ckpt_")

    def run_round():
        sink: list = []
        stream = (
            read_events_stream(spark, d, maxFilesPerTrigger=1)
            .filter(F.col("event_type").isin("view", "purchase"))
            .select(
                "user_id",
                F.col("ts_nanos").alias("tsn"),
                "event_type",
            )
        )
        q = (
            stateful_user_conversions(stream)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda bdf, bid: sink.extend(bdf.collect())
            )
            .start()
        )
        _drain(q)
        return sink

    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), d, "a")
        first = run_round()
        _stage(ev.filter(F.col("ts_nanos") >= mid), d, "b")
        second = run_round()
        # update mode: LAST emission per user, run 2 superseding run 1
        # (a user absent from run 2's files keeps the run-1 row — the
        # recovered state only re-emits for users SEEN after restart,
        # so the run-1 rows must still be consulted)
        pdf = pd.DataFrame(
            [r.asDict() for r in first] + [r.asDict() for r in second]
        )
        last = pdf.groupby("user_id").tail(1)
        got = sorted(
            (
                int(r.user_id),
                None if pd.isna(r.v0) else int(r.v0),
                None if pd.isna(r.p0) else int(r.p0),
                None if pd.isna(r.lag_min) else int(r.lag_min),
            )
            for r in last.itertuples()
        )
        assert got == expected
        assert second
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
