"""Staged certification for the round-13 queue
(queries/extensions_r13.py — x167 Heaps slope, x168 MASE, x169
hierarchical reconciliation, x170 autocovariance profile). Staged two
rounds ahead; same local gate as the r10–r12 queues: the check_oracle
differential at sf0.001 AND sf0.01, hand pins, vacuity audits."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r13
from m5_competition_kaggle_spark.sources.catalog import TABLES

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "check_oracle.py"),
)
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and check_oracle)


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(extensions_r13.QUERIES))
def test_differential_vs_duckdb(spark, name):
    sdf = extensions_r13.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r13.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    d_types = {f.name: check_oracle.arrow_type_class(f.type)
               for f in tbl.schema}
    s_types = {f.name: check_oracle.spark_type_class(f.dataType)
               for f in sdf.schema.fields}
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert sorted(s_cols) == sorted(d_cols)
    assert s_types == d_types
    assert check_oracle.value_hash(s_rows, s_cols) == \
        check_oracle.value_hash(d_rows, d_cols)


@pytest.mark.parametrize("name", sorted(extensions_r13.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    sdf = extensions_r13.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r13.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


# ------------------------------------------------------------ hand pins


def test_heaps_slope_is_sublinear(spark):
    """Vacuity + semantics: the synthetic corpus grows trigram types
    sublinearly but non-trivially — β strictly between 0.3 and 1.0,
    from all 45 decile pairs."""
    for sf in (SF, SF01):
        row = extensions_r13.x167_heaps_slope(spark, sf).collect()[0]
        assert row["n"] == 10 and row["n_pairs"] == 45, sf
        assert 300_000 < row["slope_ppm"] < 1_000_000, (
            sf, row["slope_ppm"]
        )


def test_heaps_slope_exact_linear_series(spark):
    """A hand-planted exactly-linear log-log series pins the kernel:
    ly = 2·lt ⇒ slope_ppm = 2,000,000 with the exact pair rational."""
    from m5_competition_kaggle_spark.operators.theil_sen import (
        theil_sen_slope,
    )

    pts = spark.createDataFrame(
        [("c", i * 10, i * 20) for i in range(1, 6)],
        "corpus string, lt long, ly long",
    )
    row = theil_sen_slope(pts, "corpus", "lt", "ly").collect()[0]
    assert row["slope_ppm"] == 2_000_000
    assert row["slope_num"] * 1 == 2 * row["slope_den"]


def test_mase_hand_series(spark):
    """Hand-checkable MASE: a noisy-weekly planted series where the
    lag-7 errors are constants — numerator and denominator sums are
    exact by construction."""
    # y_t = 100·(t mod 7) + t  for t in 0..29: y_t − y_{t−7} = 7
    # everywhere, so every |e| = 7; MASE = 1 exactly.
    rows = [("a", t, 100 * (t % 7) + t) for t in range(30)]
    series = spark.createDataFrame(
        rows, "event_type string, t long, y long"
    )
    # rebuild the query's aggregation on the planted series
    lagged = series.alias("a").join(
        series.select(
            "event_type",
            (F.col("t") + 7).alias("t"),
            F.col("y").alias("ylag"),
        ).alias("b"),
        ["event_type", "t"],
    )
    tmax = series.groupBy("event_type").agg(F.max("t").alias("tmax"))
    marked = lagged.join(tmax, "event_type").select(
        "event_type",
        F.abs(F.col("y") - F.col("ylag")).alias("ae"),
        (F.col("t") > F.col("tmax") - 7).alias("is_test"),
    )
    agg = marked.groupBy("event_type").agg(
        F.sum(F.when(~F.col("is_test"), F.col("ae"))).alias("tr"),
        F.sum(F.when(F.col("is_test"), F.col("ae"))).alias("te"),
        F.sum(F.when(~F.col("is_test"), 1).otherwise(0)).alias("nd"),
        F.sum(F.when(F.col("is_test"), 1).otherwise(0)).alias("nt"),
    ).collect()[0]
    assert agg["nt"] == 7 and agg["nd"] == 16
    assert agg["te"] * agg["nd"] == agg["tr"] * agg["nt"]  # MASE == 1


def test_mase_outputs_nondegenerate(spark):
    out = extensions_r13.x168_mase(spark, SF01).collect()
    assert len(out) == 5
    assert all(r["mase_ppm"] is not None for r in out)
    assert len({r["mase_ppm"] for r in out}) > 1


def test_hierarchy_reconcile_shares_sum_to_root(spark):
    """Structural identities: historical shares partition the total
    (Σ hist_leaf = hist_total implies Σ alloc within n_lists units of
    the root forecast — truncation only), and the root-vs-bottom-up
    gap is consistent across rows."""
    out = extensions_r13.x169_hierarchy_reconcile(
        spark, SF01
    ).collect()
    assert len(out) == 5
    root = {r["root_forecast"] for r in out}
    assert len(root) == 1
    root_f = root.pop()
    alloc_sum = sum(r["alloc_topdown"] for r in out)
    assert 0 <= root_f - alloc_sum < len(out)  # floor residue only
    gaps = {r["root_minus_bottom_up"] for r in out}
    assert len(gaps) == 1
    assert any(r["gap"] != 0 for r in out)  # levels genuinely differ


def test_stream_mase_equals_batch_x168(spark):
    """The streaming twin's day grid (UTC dates) and x168's epoch-day
    grid cut the same boundaries, so per-key MASE outputs must be
    IDENTICAL integers — the twin relationship as a cross-pin."""
    a = {
        r["key"]: (r["n_den"], r["n_test"], r["san_train"],
                   r["sae_test"], r["mase_ppm"])
        for r in extensions_r13.s25_stream_mase(spark, SF01).collect()
    }
    b = {
        r["event_type"]: (r["n_den"], r["n_test"], r["san_train"],
                          r["sae_test"], r["mase_ppm"])
        for r in extensions_r13.x168_mase(spark, SF01).collect()
    }
    assert a == b


def test_stream_mase_store_deployment_matches_batch(spark):
    """The ClosingDayStore deployment re-assembles through
    mase_from_cells to exactly the batch twin (the third assembly on
    the one kernel)."""
    import shutil
    import tempfile

    from m5_competition_kaggle_spark.sources.catalog import load_table
    from m5_competition_kaggle_spark.streaming.trend_monitor import (
        day_key_cells,
        mase_from_cells,
        store_day_cells,
        streaming_day_cells_update_mode,
    )
    from m5_competition_kaggle_spark.streaming.update_mode import (
        ClosingDayStore,
    )

    NS_PER_DAY = 86_400_000_000_000
    ev = load_table(spark, SF, "events")
    expected = sorted(
        tuple(r) for r in mase_from_cells(day_key_cells(ev)).collect()
    )
    assert expected
    src = tempfile.mkdtemp(prefix="masemon_src_")
    ckpt = tempfile.mkdtemp(prefix="masemon_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2

    def _stage(df, name):
        import os
        tmp = f"{src}/__{name}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(f"{tmp}/{f}", f"{src}/part-{name}.parquet")
        shutil.rmtree(tmp)

    store = ClosingDayStore(allowed_lateness_days=2)
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), "a")
        _stage(ev.filter(F.col("ts_nanos") >= mid), "b")
        q = streaming_day_cells_update_mode(
            spark, src, store, ckpt, maxFilesPerTrigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            tuple(r)
            for r in mase_from_cells(
                store_day_cells(spark, store)
            ).collect()
        )
        assert got == expected
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_trend_monitor_state_survives_restart(spark):
    """Checkpoint recovery for the trend monitor (the s17–s20
    standard): run on half the corpus with a MID-day split, stop,
    stage the rest, restart from the SAME checkpoint into the SAME
    store — the recovered per-day cells must merge with the new rows
    (the split day's cell is updated, not duplicated), and all three
    assemblies re-derive the batch twins exactly."""
    import shutil
    import tempfile

    from m5_competition_kaggle_spark.sources.catalog import load_table
    from m5_competition_kaggle_spark.streaming.trend_monitor import (
        changepoint_from_cells,
        day_key_cells,
        mase_from_cells,
        store_day_cells,
        streaming_day_cells_update_mode,
        theil_sen_from_cells,
        theil_sen_from_cells_windowed,
    )
    from m5_competition_kaggle_spark.streaming.update_mode import (
        ClosingDayStore,
    )

    NS_PER_DAY = 86_400_000_000_000
    ev = load_table(spark, SF, "events")
    cells = day_key_cells(ev)
    exp = {
        "cp": sorted(
            tuple(r) for r in changepoint_from_cells(cells).collect()
        ),
        "ts": sorted(
            tuple(r) for r in theil_sen_from_cells(cells).collect()
        ),
        "mase": sorted(
            tuple(r) for r in mase_from_cells(cells).collect()
        ),
        # s30's bounded-pair assembly recovers from the same cells
        "tsw": sorted(
            tuple(r)
            for r in theil_sen_from_cells_windowed(
                cells, trailing_days=28
            ).collect()
        ),
    }
    src = tempfile.mkdtemp(prefix="trendrec_src_")
    ckpt = tempfile.mkdtemp(prefix="trendrec_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2  # MID-day split

    def _stage(df, name):
        import os
        tmp = f"{src}/__{name}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(f"{tmp}/{f}", f"{src}/part-{name}.parquet")
        shutil.rmtree(tmp)

    store = ClosingDayStore(allowed_lateness_days=2)
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), "a")
        q = streaming_day_cells_update_mode(
            spark, src, store, ckpt, maxFilesPerTrigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        half = dict(store.data)
        assert half  # non-empty half-corpus state
        _stage(ev.filter(F.col("ts_nanos") >= mid), "b")
        q2 = streaming_day_cells_update_mode(
            spark, src, store, ckpt, maxFilesPerTrigger=1
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        # the split-day cells were UPDATED in place, not duplicated
        assert len(store.data) >= len(half)
        lifted = store_day_cells(spark, store)
        assert sorted(
            tuple(r) for r in changepoint_from_cells(lifted).collect()
        ) == exp["cp"]
        assert sorted(
            tuple(r) for r in theil_sen_from_cells(lifted).collect()
        ) == exp["ts"]
        assert sorted(
            tuple(r) for r in mase_from_cells(lifted).collect()
        ) == exp["mase"]
        assert sorted(
            tuple(r)
            for r in theil_sen_from_cells_windowed(
                lifted, trailing_days=28
            ).collect()
        ) == exp["tsw"]
        assert store.rejected == 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_acf_profile_lag0_is_unit(spark):
    """Lag 0 is the variance itself — ratio exactly 1000 — and the
    profile is nondegenerate across lags."""
    out = extensions_r13.x170_acf_profile(spark, SF01).collect()
    assert len(out) == 40  # 5 types × lags 0..7
    for r in out:
        if r["k"] == 0:
            assert r["ratio_permille"] == 1000
    non0 = [r["ratio_permille"] for r in out if r["k"] > 0]
    assert len(set(non0)) > 3
    # paired-subsample covariances are not Cauchy–Schwarz-bounded by
    # the full-series variance, but anything past 2x signals a bug
    assert all(abs(v) < 2000 for v in non0 if v is not None)


def test_windowed_trend_window_bites(spark):
    """The fixture spans 30 days per key, so the trailing-28 window
    must DROP the two earliest days (n = 28, pairs = C(28,2) = 378
    per key) — the differential is pinned non-vacuous on the window
    boundary, not an alias of the unbounded s24."""
    out = {
        r["key"]: r
        for r in extensions_r13.s30_windowed_trend(
            spark, SF
        ).collect()
    }
    full = {
        r["key"]: r
        for r in __import__(
            "m5_competition_kaggle_spark.queries.extensions_r12",
            fromlist=["x"],
        ).s24_stream_theil_sen(spark, SF).collect()
    }
    assert set(out) == set(full) and out
    for k, r in out.items():
        assert r["n"] == 28 and r["n_pairs"] == 378
        assert full[k]["n"] == 30 and full[k]["n_pairs"] == 435


def test_windowed_trend_bounds_pairs_on_long_series(spark):
    """A 200-day synthetic series: unbounded pairs would be
    C(200,2) = 19,900; the windowed kernel must stay at C(28,2) = 378
    and pick its median from the recent window only (slope of the
    RECENT regime, not the stale history)."""
    from m5_competition_kaggle_spark.streaming.trend_monitor import (
        theil_sen_from_cells_windowed,
    )

    rows = []
    for i in range(200):
        # old regime flat at 1000, last 40 days rising 5/day
        y = 1000 if i < 160 else 1000 + (i - 159) * 5
        rows.append(("k1", f"2024-01-01", i, y))
    df = spark.createDataFrame(
        [(k, i, y) for (k, _, i, y) in rows],
        "key string, i int, y_sum long",
    ).selectExpr(
        "key", "date_add(DATE '2024-01-01', i) AS day", "y_sum"
    )
    out = theil_sen_from_cells_windowed(df, trailing_days=28).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 28 and r["n_pairs"] == 378
    # every pair inside the last 28 days has slope exactly 5/day
    assert r["slope_ppm"] == 5_000_000
