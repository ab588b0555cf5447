"""Checkpoint recovery for the CvM (s26) and Gini (s27) trajectory
monitors — the s17–s20 recovery standard applied to the two new
readouts on the distribution-monitor kernel: stop the stream
mid-corpus with a MID-day split, restart from the SAME checkpoint with
the rest of the files staged, and the final snapshot must equal the
certified batch twin over everything (recovered per-day state merged
with new rows, not duplicated). Plus the degenerate-input guards the
r14 file gave the CvM day table, extended to the Gini cells."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries.extensions_r14 import (
    SPLIT_NS,
    s26_stream_cvm,
)
from m5_competition_kaggle_spark.queries.extensions_r15 import (
    s27_stream_gini,
)
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.cvm_monitor import (
    streaming_cvm_trajectory,
)
from m5_competition_kaggle_spark.streaming.gini_monitor import (
    streaming_gini_trajectory,
)

SF = "/root/testdata/sf0.001"
NS_PER_DAY = 86_400_000_000_000


def _stage(df, src, name):
    tmp = os.path.join(src, f"__{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(tmp, f),
                os.path.join(src, f"part-{name}.parquet"),
            )
    shutil.rmtree(tmp)


def _drain(q, sink, key):
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sorted(key(r) for r in sink)


def _recovery_roundtrip(spark, run_round, expected, mid_nanos):
    ev = load_table(spark, SF, "events")
    src = tempfile.mkdtemp(prefix="mon15_recovery_src_")
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid_nanos), src, "a")
        first = run_round(src)
        assert first and first != expected  # half-corpus snapshot
        _stage(ev.filter(F.col("ts_nanos") >= mid_nanos), src, "b")
        assert run_round(src) == expected
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_cvm_state_survives_restart(spark):
    key = lambda r: (  # noqa: E731
        str(r.day), r.n_ref, r.n_cmp, r.n_cells, r.gap_energy,
        r.omega2_micro,
    )
    expected = sorted(
        key(r) for r in s26_stream_cvm(spark, SF).collect()
    )
    assert expected
    ref = (
        load_table(spark, SF, "events")
        .filter(F.col("ts_nanos") < F.lit(SPLIT_NS))
        .groupBy(F.expr("CAST(round(value) AS BIGINT)").alias("q"))
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    ckpt = tempfile.mkdtemp(prefix="cvm_recovery_ckpt_")

    def run_round(src):
        sink: list = []
        q = streaming_cvm_trajectory(
            spark, src, ref, SPLIT_NS, sink, ckpt
        )
        return _drain(q, sink, key)

    try:
        _recovery_roundtrip(
            spark, run_round, expected,
            SPLIT_NS + 7 * NS_PER_DAY + NS_PER_DAY // 2,
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_gini_state_survives_restart(spark):
    key = lambda r: (  # noqa: E731
        str(r.day), r.n_members, r.total, r.max_value,
        r.top_share_ppm, r.rank_mass, r.gini_ppm,
    )
    expected = sorted(
        key(r) for r in s27_stream_gini(spark, SF).collect()
    )
    assert expected
    ckpt = tempfile.mkdtemp(prefix="gini_recovery_ckpt_")
    ev = load_table(spark, SF, "events")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]

    def run_round(src):
        sink: list = []
        q = streaming_gini_trajectory(spark, src, sink, ckpt)
        return _drain(q, sink, key)

    try:
        _recovery_roundtrip(
            spark, run_round, expected,
            lo + 15 * NS_PER_DAY + NS_PER_DAY // 2,  # MID-day split
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


# ------------------------------------------------------ edge guards


def test_gini_cells_null_bucket_dropped(spark):
    """A NULL quantized bucket must not shift the cumulative ranks
    (the ksdist convention, mirrored by gini_from_cells)."""
    from m5_competition_kaggle_spark.operators.gini import (
        gini_from_cells,
    )

    cells = spark.createDataFrame(
        [("g", None, 5), ("g", 1, 2), ("g", 3, 2)],
        "grp string, q long, c long",
    )
    row = gini_from_cells(cells, ["grp"]).collect()[0]
    assert row["n_members"] == 4 and row["total"] == 8


def test_interarrival_single_event_type_drops(spark):
    """A type with one event has no gap: its lag is NULL and the
    type emits nothing, rather than a zero-variance row."""
    from pyspark.sql.window import Window

    rows = [("lone", 1_000, 1), ("busy", 2_000, 2),
            ("busy", 62_000_000_000, 3)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_nanos long, event_id long"
    )
    w = Window.partitionBy("event_type").orderBy(
        "ts_nanos", "event_id"
    )
    gaps = df.select(
        "event_type",
        (F.col("ts_nanos") - F.lag("ts_nanos").over(w)).alias("d"),
    ).filter(F.col("d").isNotNull())
    got = {r["event_type"] for r in gaps.collect()}
    assert got == {"busy"}
