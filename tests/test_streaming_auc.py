"""Streaming daily ROC-AUC monitor (streaming/auc_monitor.py): the
model-quality member of the monitor family. Pins:

1. the streaming update-mode deployment (day-score-class cells merged
   into the ClosingDayStore) re-assembles, through the SAME
   auc_from_cells kernel, to exactly the batch day-AUC table;
2. a restart against the same checkpoint and persistent store neither
   loses nor double-counts cells;
3. the kernel itself against the row-level operator on the same data
   (cells → AUC == rows → AUC)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.auc import group_auc
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.auc_monitor import (
    auc_day_table,
    day_score_class_counts,
    store_day_auc_cells,
    streaming_day_auc_update_mode,
)
from m5_competition_kaggle_spark.streaming.update_mode import (
    ClosingDayStore,
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


def _key(r):
    return (
        str(r["day"]), r["n_pos"], r["n_neg"], r["n_scores"],
        r["auc_ppm"],
    )


def test_kernel_matches_row_level_operator(spark):
    """auc_from_cells over the monitor's cells == group_auc over the
    raw rows at the same quantization — same arithmetic, two entries."""
    ev = load_table(spark, SF, "events")
    via_cells = sorted(
        _key(r)
        for r in auc_day_table(day_score_class_counts(ev)).collect()
    )
    rows = ev.select(
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("__d"),
        F.expr("CAST(round(value) AS BIGINT)").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    via_rows = sorted(
        (str(r["__d"]), r["n_pos"], r["n_neg"], r["n_scores"],
         r["auc_ppm"])
        for r in group_auc(rows, "__d", "score", "y").collect()
    )
    # day representations differ (date vs index) — compare the metric
    # columns in order
    assert [k[1:] for k in via_cells] == [k[1:] for k in via_rows]
    assert len(via_cells) > 1


def test_kernel_merges_duplicate_score_cells(spark):
    """A union of two cell tables (e.g. re-assembled update-mode
    deltas) carries duplicate (group, score) cells; auc_from_cells
    must merge them before the cumulative window, or tied scores
    split arbitrarily between 'strictly below' and 'tied' and the
    AUC is nondeterministically wrong."""
    from m5_competition_kaggle_spark.operators.auc import (
        auc_from_cells,
    )

    merged = [("g", 5, 3, 2), ("g", 7, 1, 4)]
    split = [  # same cells, each split across two fragments
        ("g", 5, 1, 1), ("g", 5, 2, 1),
        ("g", 7, 1, 0), ("g", 7, 0, 4),
    ]
    schema = "grp string, score bigint, c_pos bigint, c_neg bigint"
    want = auc_from_cells(
        spark.createDataFrame(merged, schema), ["grp"]
    ).collect()
    got = auc_from_cells(
        spark.createDataFrame(split, schema), ["grp"]
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert want[0]["auc_ppm"] is not None


def test_update_mode_stream_matches_batch_table(spark):
    ev = load_table(spark, SF, "events")
    expected = sorted(
        _key(r)
        for r in auc_day_table(day_score_class_counts(ev)).collect()
    )
    assert expected

    src = tempfile.mkdtemp(prefix="aucmon_src_")
    ckpt = tempfile.mkdtemp(prefix="aucmon_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    store = ClosingDayStore(allowed_lateness_days=2)
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        q = streaming_day_auc_update_mode(
            spark, src, store, ckpt, maxFilesPerTrigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            _key(r)
            for r in auc_day_table(
                store_day_auc_cells(spark, store)
            ).collect()
        )
        assert got == expected
        assert store.rejected == 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_update_mode_survives_restart_with_persistent_store(spark):
    """Stop after the first file, restart on the same checkpoint and
    store: the second run must only add the remaining deltas."""
    ev = load_table(spark, SF, "events")
    expected = sorted(
        _key(r)
        for r in auc_day_table(day_score_class_counts(ev)).collect()
    )
    src = tempfile.mkdtemp(prefix="aucmon2_src_")
    ckpt = tempfile.mkdtemp(prefix="aucmon2_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    store = ClosingDayStore(allowed_lateness_days=2)
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        q = streaming_day_auc_update_mode(
            spark, src, store, ckpt, maxFilesPerTrigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        q = streaming_day_auc_update_mode(
            spark, src, store, ckpt, maxFilesPerTrigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            _key(r)
            for r in auc_day_table(
                store_day_auc_cells(spark, store)
            ).collect()
        )
        assert got == expected
        assert store.rejected == 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
