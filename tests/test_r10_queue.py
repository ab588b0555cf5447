"""Staged certification for the round-10 queue
(queries/extensions_r10.py — x148 isotonic PAV, x149 changepoint,
x150 RBO, s22 streaming-ECE twin). The module is deliberately NOT
registered in queries/__init__ (the r9 head-50 window is exactly
full); this test runs the same Spark-vs-DuckDB differential as
scripts/check_oracle.py so the batch is certified-locally before its
r10 registration, plus hand-computed unit pins and the sf0.01
vacuity audits the round-7 lessons demand."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r10
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


@pytest.mark.parametrize("name", sorted(extensions_r10.QUERIES))
def test_differential_vs_duckdb(spark, name):
    """Row count, column names and order-insensitive value hash match
    DuckDB at sf0.001 — the driver's gate, run locally."""
    sdf = extensions_r10.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r10.ORACLES[name]).arrow()
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


@pytest.mark.parametrize("name", sorted(extensions_r10.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    """Same differential at sf0.01 — the scale the driver certifies."""
    sdf = extensions_r10.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r10.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


def test_isotonic_hand_example(spark):
    """PAV pins against the textbook pooled solution. Rates
    0/10, 8/10, 2/10, 10/10 by bin: bins 1 and 2 violate
    monotonicity and pool to (8+2)/20 = 0.5; bins 0 and 3 stand."""
    from m5_competition_kaggle_spark.operators.isotonic import (
        isotonic_fit,
    )

    rows = []
    for b, pos in [(0, 0), (1, 8), (2, 2), (3, 10)]:
        rows += [("g", b, i < pos) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, bin int, y boolean")
    got = {
        r["bin"]: r
        for r in isotonic_fit(df, ["g"], "bin", "y").collect()
    }
    assert [got[b]["fitted_permille"] for b in range(4)] == [
        0, 500, 500, 1000
    ]
    assert [got[b]["raw_permille"] for b in range(4)] == [
        0, 800, 200, 1000
    ]
    # already-monotone input is returned unchanged
    mono = []
    for b, pos in [(0, 1), (1, 5), (2, 9)]:
        mono += [("g", b, i < pos) for i in range(10)]
    df = spark.createDataFrame(mono, "g string, bin int, y boolean")
    got = {
        r["bin"]: r["fitted_permille"]
        for r in isotonic_fit(df, ["g"], "bin", "y").collect()
    }
    assert got == {0: 100, 1: 500, 2: 900}


def test_isotonic_is_monotone_and_weighted_mean_preserving(spark):
    """Structural invariants of PAV on real data at sf0.001: fitted
    is non-decreasing within each segment, bounded by [0, 1000], and
    pooling never changes the group's weighted total."""
    out = extensions_r10.x148_isotonic_calibration(
        spark, SF
    ).collect()
    by_seg: dict = {}
    for r in out:
        by_seg.setdefault(r["segment"], []).append(r)
    assert len(by_seg) == 4
    for seg, rows in by_seg.items():
        rows.sort(key=lambda r: r["bin"])
        fitted = [r["fitted_permille"] for r in rows]
        assert fitted == sorted(fitted), (seg, fitted)
        assert all(0 <= f <= 1000 for f in fitted)
        # pooled-block means average the raw rates they replace:
        # sum_b n_b·fitted ≈ 1000·sum_b n_pos (within flooring slack)
        tot = sum(r["n_b"] * r["fitted_permille"] for r in rows)
        want = 1000 * sum(r["n_pos"] for r in rows)
        slack = sum(r["n_b"] for r in rows)  # 1 permille per row
        assert abs(tot - want) <= slack, (seg, tot, want)


def test_changepoint_hand_example(spark):
    """A clean level shift is localized exactly; a constant series
    reports direction 'flat' with g = 0."""
    from m5_competition_kaggle_spark.operators.changepoint import (
        best_mean_shift,
    )

    rows = [("a", t, 10) for t in range(10)]
    rows += [("a", t, 50) for t in range(10, 20)]
    rows += [("flat", t, 7) for t in range(5)]
    rows += [("solo", 0, 3)]
    df = spark.createDataFrame(rows, "k string, t bigint, y bigint")
    got = {r["k"]: r for r in best_mean_shift(
        df, "k", "t", "y").collect()}
    a = got["a"]
    # split after index 10 (t=9): left mean 10, right mean 50
    assert (a["n"], a["cp_idx"], a["cp_t"]) == (20, 10, 9)
    assert a["direction"] == "up"
    # g = n·S_t − t·S_n = 20·100 − 10·600 = −4000
    assert (a["g_abs"], a["den"]) == (4000, 100)
    assert got["flat"]["g_abs"] == 0
    assert got["flat"]["direction"] == "flat"
    assert "solo" not in got  # n < 2 has no interior split


def test_rbo_hand_examples(spark):
    """Identical rankings hit the truncated-prefix ceiling
    1 − 0.9^10 = 651321 ppm; disjoint rankings score 0; a single
    shared top-1 contributes W(1)."""
    from m5_competition_kaggle_spark.operators.rbo import (
        _W_NUM,
        rbo_prefix,
    )

    ident = [(1, d, r) for r, d in enumerate(range(100, 110), 1)]
    a = spark.createDataFrame(ident, "q long, doc long, rank long")
    r = rbo_prefix(a, a, "q", "doc", "rank").collect()[0]
    assert (r["n_matched"], r["rbo_ppm"]) == (10, 651321)

    b = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate(range(200, 210), 1)],
        "q long, doc long, rank long",
    )
    assert rbo_prefix(a, b, "q", "doc", "rank").count() == 0

    c = spark.createDataFrame(
        [(1, 100, 1)] + [(1, d, r) for r, d in
                         enumerate(range(300, 309), 2)],
        "q long, doc long, rank long",
    )
    r = rbo_prefix(a, c, "q", "doc", "rank").collect()[0]
    assert (r["n_matched"], r["rbo_num"]) == (1, _W_NUM[1])


def test_adida_hand_example(spark):
    """SES over the bucket grid WITH reconstructed zeros — the zero
    participation is the method, so it is pinned explicitly."""
    from m5_competition_kaggle_spark.operators.adida import (
        adida_forecast,
    )

    # demands at t=0 (q=8) and t=5 (q=4), m=2 → buckets [8, 0, 4]:
    # z = 8 → 8 + (0−8) DIV 2 = 4 → 4 + (4−4) DIV 2 = 4
    df = spark.createDataFrame(
        [("a", 0, 8), ("a", 5, 4)], "k string, t bigint, q bigint"
    )
    r = adida_forecast(
        df, "k", "t", "q", bucket_days=2, alpha_den=2
    ).collect()[0]
    assert (r["n_buckets"], r["n_nonzero"], r["agg_level"]) == (
        3, 2, 4,
    )
    assert r["forecast_ppm"] == 1_000_000 * 4 // 2
    # adjacent buckets, no gap: [8, 4] → 8 + (4−8) DIV 2 = 6
    df = spark.createDataFrame(
        [("a", 0, 8), ("a", 2, 4)], "k string, t bigint, q bigint"
    )
    r = adida_forecast(
        df, "k", "t", "q", bucket_days=2, alpha_den=2
    ).collect()[0]
    assert (r["n_buckets"], r["agg_level"]) == (2, 6)
    # singleton series: level = the one bucket, grid length 1
    df = spark.createDataFrame(
        [("s", 7, 5)], "k string, t bigint, q bigint"
    )
    r = adida_forecast(
        df, "k", "t", "q", bucket_days=2, alpha_den=2
    ).collect()[0]
    assert (r["n_buckets"], r["agg_level"]) == (1, 5)


def test_forecastability_hand_examples(spark):
    """Constant series → vmr 0 / NULL eta² / slope 0; a pure
    day-of-week pattern → eta² = 10⁶ exactly; y = 3t → slope 3·10⁶."""
    from m5_competition_kaggle_spark.operators.forecastability import (
        forecastability_features,
    )

    rows = [("const", t, 5) for t in range(14)]
    rows += [("dow", t, 10 + (t % 7)) for t in range(14)]
    rows += [("trend", t, 3 * t) for t in range(14)]
    df = spark.createDataFrame(rows, "k string, t bigint, y bigint")
    got = {r["k"]: r for r in forecastability_features(
        df, "k", "t", "y").collect()}
    c = got["const"]
    assert (c["vmr_permille"], c["eta2_dow_ppm"],
            c["trend_slope_ppm"]) == (0, None, 0)
    d = got["dow"]
    # two identical values per dow ⇒ zero within-group variance
    assert d["eta2_dow_ppm"] == 1_000_000
    t = got["trend"]
    assert t["trend_slope_ppm"] == 3_000_000
    assert t["eta2_dow_ppm"] < 1_000_000


def test_theil_sen_hand_example(spark):
    """y = 2t + contamination: the median pairwise slope ignores one
    wild outlier that would wreck OLS; exact rational output."""
    from m5_competition_kaggle_spark.operators.theil_sen import (
        theil_sen_slope,
    )

    rows = [("a", t, 2 * t) for t in range(9)] + [("a", 9, 500)]
    rows += [("b", 0, 10), ("b", 1, 14)]
    rows += [("solo", 3, 1)]
    df = spark.createDataFrame(rows, "k string, t bigint, y bigint")
    got = {r["k"]: r for r in theil_sen_slope(
        df, "k", "t", "y").collect()}
    a = got["a"]
    assert (a["n"], a["n_pairs"]) == (10, 45)
    # 36 clean pairs all have slope exactly 2; 9 outlier pairs are
    # huge — the median lands in the clean mass
    assert a["slope_num"] == 2 * a["slope_den"]
    assert a["slope_ppm"] == 2_000_000
    b = got["b"]
    assert (b["slope_num"], b["slope_den"], b["slope_ppm"]) == (
        4, 1, 4_000_000,
    )
    assert "solo" not in got


def test_kmeans_hand_example(spark):
    """Two obvious clusters in 1-D: Lloyd must move the seed
    centroids onto the group means and drive inertia to the
    within-group floor."""
    from m5_competition_kaggle_spark.operators.kmeans import (
        kmeans_lloyd,
    )

    # ids 0,1 seed the two centroids at 0.0 and 0.001 (quantized 0
    # and 1); the data mass sits at ~0 and ~10 (quantized 0/10000)
    rows = [
        (0, [0.0]), (1, [0.001]),
        (2, [0.002]), (3, [0.001]),
        (4, [10.0]), (5, [10.002]), (6, [9.998]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    out = {r["cid"]: r for r in kmeans_lloyd(
        df, k=2, rounds=2).collect()}
    assert set(out) == {0, 1}
    sizes = sorted(r["n_vectors"] for r in out.values())
    assert sizes == [3, 4]
    # the far cluster's trained centroid sits at the rounded mean of
    # {10000, 10002, 9998} = 10000
    far = max(out.values(), key=lambda r: r["centroid_l1"])
    assert far["centroid_l1"] == 10000
    assert far["inertia"] == 2 * 2 * 2  # (±2)² twice
    # empty-cluster carry-forward: duplicate seeds — every vector
    # ties to both centroids and the cid-asc tie-break sends ALL of
    # them to cluster 0, so cluster 1 goes empty (keeps its seed) and
    # the final summary only reports populated clusters
    solo = spark.createDataFrame(
        [(0, [0.0]), (1, [0.0]), (2, [0.0]), (3, [0.0])],
        "vec_id bigint, embedding array<double>",
    )
    got = kmeans_lloyd(solo, k=2, rounds=2).collect()
    assert len(got) == 1
    assert (got[0]["cid"], got[0]["n_vectors"], got[0]["inertia"]) \
        == (0, 4, 0)


def test_vacuity_sf001_audits(spark):
    """Round-7 lesson: every certificate must do real work at the
    certification SF."""
    iso = extensions_r10.x148_isotonic_calibration(
        spark, SF01
    ).collect()
    # pooling actually happened somewhere: at least one bin's fitted
    # differs from its raw rate, and fitted values are not all equal
    assert any(
        r["fitted_permille"] != r["raw_permille"] for r in iso
    )
    assert len({r["fitted_permille"] for r in iso}) > 1
    assert len({r["segment"] for r in iso}) == 4

    cp = extensions_r10.x149_changepoint(spark, SF01).collect()
    assert len(cp) == 5
    assert all(r["g_abs"] > 0 for r in cp)  # no degenerate flats
    assert len({r["cp_t"] for r in cp}) > 1  # not all the same split

    rbo = extensions_r10.x150_rank_rbo(spark, SF01).collect()
    assert len(rbo) == 10
    vals = {r["rbo_ppm"] for r in rbo}
    assert len(vals) > 1  # IVF really degrades some queries
    assert all(0 <= r["rbo_ppm"] <= 651321 for r in rbo)
    assert any(r["rbo_ppm"] > 0 for r in rbo)

    ece = extensions_r10.s22_stream_ece(spark, SF01).collect()
    assert len(ece) == 30
    assert len({r["ece_ppm"] for r in ece}) > 1
    assert all(r["mce_permille"] >= 0 for r in ece)
    assert all(r["n_bins"] <= 101 for r in ece)  # bounded state

    ad = extensions_r10.x151_adida(spark, SF01).collect()
    assert len(ad) == 100
    # the grid really reconstructs zeros: some parts have more
    # buckets than nonzero buckets, and levels vary
    assert any(r["n_buckets"] > r["n_nonzero"] for r in ad)
    assert len({r["agg_level"] for r in ad}) > 1

    fc = extensions_r10.x152_forecastability(spark, SF01).collect()
    assert len(fc) == 5
    assert all(r["vmr_permille"] is not None for r in fc)
    assert len({r["eta2_dow_ppm"] for r in fc}) > 1
    assert all(r["eta2_dow_ppm"] < 1_000_000 for r in fc)

    ts = extensions_r10.x153_theil_sen(spark, SF01).collect()
    assert len(ts) == 5
    assert all(r["n_pairs"] == r["n"] * (r["n"] - 1) // 2 for r in ts)
    assert len({r["slope_ppm"] for r in ts}) > 1

    from m5_competition_kaggle_spark.sources.catalog import (
        load_table,
    )

    n_emb = load_table(spark, SF01, "embeddings").count()
    km = extensions_r10.x155_kmeans_lloyd(spark, SF01).collect()
    assert len(km) == 16
    assert sum(r["n_vectors"] for r in km) == n_emb
    assert len({r["centroid_l1"] for r in km}) > 1
    assert all(r["inertia"] > 0 for r in km)

    ms = extensions_r10.x154_method_select(spark, SF01).collect()
    assert len(ms) > 100
    assert {r["method"] for r in ms} == {"croston", "adida_ses"}
    assert len({r["sbc_class"] for r in ms}) == 4
    assert all(r["f_ppm"] is not None for r in ms)
    # the baseline contest is real: each side wins somewhere
    assert any(r["beats_zero"] == 1 for r in ms)
    assert any(r["beats_zero"] == 0 for r in ms)
    # dense user series must beat the zero forecaster mostly
    users = [r for r in ms if r["family"] == "user"]
    assert sum(r["beats_zero"] for r in users) > len(users) // 2
