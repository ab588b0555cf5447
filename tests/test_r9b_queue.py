"""Staged certification for the round-9 queue, second batch
(queries/extensions_r9b.py — x141 SBC, x142 silhouette, x143 interval
score, x144 day AUC). The module is deliberately NOT registered in
queries/__init__ (the r8 head-50 window is exactly full); this test
runs the same Spark-vs-DuckDB differential as scripts/check_oracle.py
so the batch is certified-locally before its r9 registration, plus
hand-computed unit pins and the sf0.01 vacuity audits the round-7
lessons demand."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r9b
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


@pytest.mark.parametrize("name", sorted(extensions_r9b.QUERIES))
def test_differential_vs_duckdb(spark, name):
    """Row count, column names and order-insensitive value hash match
    DuckDB at sf0.001 — the driver's gate, run locally."""
    sdf = extensions_r9b.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r9b.ORACLES[name]).arrow()
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


@pytest.mark.parametrize("name", sorted(extensions_r9b.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    """Same differential at sf0.01 — the scale the driver certifies."""
    sdf = extensions_r9b.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r9b.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


def test_sbc_quadrants_hand_example(spark):
    """One series per quadrant, arithmetic checked by hand."""
    from m5_competition_kaggle_spark.operators.intermittency import (
        sbc_classes,
    )

    rows = []
    # smooth: daily demand (ADI=1), constant sizes (CV2=0)
    rows += [("s", t, 10) for t in range(10)]
    # erratic: daily demand, wildly varying sizes
    rows += [("e", t, q) for t, q in enumerate([1, 40, 1, 40, 1, 40])]
    # intermittent: sparse demand (gap 5), constant sizes
    rows += [("i", 5 * t, 10) for t in range(6)]
    # lumpy: sparse demand, varying sizes
    rows += [("l", 5 * t, q) for t, q in
             enumerate([1, 40, 1, 40, 1, 40])]
    df = spark.createDataFrame(rows, "k string, t bigint, q bigint")
    got = {r["k"]: r for r in sbc_classes(df, "k", "t", "q").collect()}
    assert got["s"]["sbc_class"] == "smooth"
    assert got["e"]["sbc_class"] == "erratic"
    assert got["i"]["sbc_class"] == "intermittent"
    assert got["l"]["sbc_class"] == "lumpy"
    # ADI of the sparse series: span 25 over 5 intervals = 5.00
    assert got["i"]["adi_x100"] == 500
    # CV2 of constant sizes is exactly 0
    assert got["s"]["cv2_x100"] == 0 and got["i"]["cv2_x100"] == 0
    # singleton series drop (no interval)
    single = spark.createDataFrame(
        [("x", 0, 5)], "k string, t bigint, q bigint"
    )
    assert sbc_classes(single, "k", "t", "q").count() == 0


def test_auc_hand_example(spark):
    """AUC pins: perfect separation → 1.0; with one tie pair the tie
    contributes half mass; inverted → 0."""
    from m5_competition_kaggle_spark.operators.auc import group_auc

    perfect = [("g", s, 1 if s >= 10 else 0) for s in range(20)]
    df = spark.createDataFrame(
        perfect, "g string, score bigint, label int"
    )
    r = group_auc(df, "g", "score", "label").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc_ppm"]) == (10, 10, 1000000)

    inverted = [("g", s, 0 if s >= 10 else 1) for s in range(20)]
    df = spark.createDataFrame(
        inverted, "g string, score bigint, label int"
    )
    assert group_auc(df, "g", "score", "label").collect()[0][
        "auc_ppm"] == 0

    # pos at {1, 2}, neg at {0, 2}: pairs (1>0)=1, (1=2... ) —
    # U = 1·(pos1>neg0) + ½·(pos2=neg2) + 1·(pos2>neg0) = 2.5 of 4
    tied = [("g", 1, 1), ("g", 2, 1), ("g", 0, 0), ("g", 2, 0)]
    df = spark.createDataFrame(tied, "g string, score bigint, label int")
    assert group_auc(df, "g", "score", "label").collect()[0][
        "auc_ppm"] == 625000

    # one-class group → NULL auc
    onec = [("g", 1, 1), ("g", 2, 1)]
    df = spark.createDataFrame(onec, "g string, score bigint, label int")
    assert group_auc(df, "g", "score", "label").collect()[0][
        "auc_ppm"] is None


def test_interval_score_hand_example(spark):
    """Train 1..20 per key, horizon covers the 3 eval periods; α=500:
    l = q(250) = 5, u = q(750) = 15 (type-1, k = ceil(u·n/1000))."""
    from m5_competition_kaggle_spark.operators.interval_score import (
        scaled_interval_score,
    )

    rows = [("a", t, t) for t in range(1, 21)]
    rows += [("a", 21, 10), ("a", 22, 0), ("a", 23, 30)]
    df = spark.createDataFrame(rows, "k string, t bigint, y bigint")
    out = scaled_interval_score(
        spark, df, "k", "t", "y", horizon=3, alphas_permille=(500,)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_train"], r["n_eval"]) == (20, 3)
    assert (r["lo"], r["hi"]) == (5, 15)
    # y=10 in; y=0 misses low by 5; y=30 misses high by 15
    assert (r["n_in"], r["cover_permille"]) == (1, 333)
    # w per period: 500·10 = 5000 each, plus 2000·5 and 2000·15
    assert r["w_sum"] == 3 * 5000 + 2000 * 5 + 2000 * 15
    # scale: train diffs all 1 → scale_num 19, n_diff 19
    assert (r["scale_num"], r["n_diff"]) == (19, 19)
    assert r["sis_ppk"] == 1000 * r["w_sum"] * 19 // (500 * 3 * 19)

    # constant train series → NULL sis, coverage still reported
    const = [("c", t, 7) for t in range(10)] + [("c", 10, 7)]
    df = spark.createDataFrame(const, "k string, t bigint, y bigint")
    r = scaled_interval_score(
        spark, df, "k", "t", "y", horizon=1, alphas_permille=(500,)
    ).collect()[0]
    assert r["sis_ppk"] is None and r["cover_permille"] == 1000


def test_silhouette_hand_example(spark):
    """Two tight, well-separated clusters → s ≈ 1; a point midway →
    s ≈ 0. Integer arithmetic checked against the formula."""
    from m5_competition_kaggle_spark.operators.silhouette import (
        simplified_silhouette,
    )

    rows = [
        (1, 0, [0.0, 0.0]), (2, 0, [0.0, 0.002]),
        (3, 1, [1.0, 0.0]), (4, 1, [1.0, 0.002]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )
    out = {r["cluster"]: r for r in simplified_silhouette(
        df, "vec_id", "label", "embedding").collect()}
    # centroids: (0, 1) and (1000, 1) after quantization+rounding;
    # a = 1 for every point, b = 1000 → s = 1e6·999 DIV 1000
    assert out[0]["n_points"] == 2
    assert out[0]["mean_s_ppm"] == 1000000 * 999 // 1000
    assert out[1]["mean_s_ppm"] == 1000000 * 999 // 1000


def test_ece_hand_example(spark):
    """Perfectly calibrated bin → 0; a bin predicting 0.5 with all
    positives → dev 0.5 of probability per row."""
    from m5_competition_kaggle_spark.operators.ece import (
        expected_calibration_error,
    )
    from pyspark.sql import functions as F

    cal = spark.createDataFrame(
        [(500, 1), (500, 1), (500, 0), (500, 0)], "s bigint, p int"
    )
    r = expected_calibration_error(
        cal, F.col("s"), F.col("p") == 1, bin_width=100
    ).collect()[0]
    assert (r["n"], r["n_bins"], r["abs_dev_sum"], r["ece_ppm"]) == \
        (4, 1, 0, 0)

    mis = spark.createDataFrame(
        [(500, 1)] * 4 + [(100, 0)] * 4, "s bigint, p int"
    )
    r = expected_calibration_error(
        mis, F.col("s"), F.col("p") == 1, bin_width=100
    ).collect()[0]
    # bin 5: |4000 - 2000| = 2000; bin 1: |0 - 400| = 400
    assert (r["n_bins"], r["abs_dev_sum"]) == (2, 2400)
    assert r["ece_ppm"] == 1000 * 2400 // 8
    assert (r["mce_permille"], r["mce_bin"]) == (500, 5)


def test_demand_gaps_hand_example(spark):
    """Gaps of a hand-built sparse series; type-1 quantile pins."""
    from m5_competition_kaggle_spark.operators.demand_gaps import (
        demand_gap_stats,
    )

    # demands at t = 0, 1, 3, 10, 50 → gaps [1, 2, 7, 40]
    df = spark.createDataFrame(
        [("a", t) for t in (0, 1, 3, 10, 50)] + [("solo", 5)],
        "k string, t bigint",
    )
    out = {r["k"]: r for r in demand_gap_stats(
        df, "k", "t", over_threshold=30).collect()}
    r = out["a"]
    # p50: k = ceil(500·4/1000) = 2 → 2; p90: k = ceil(900·4/1000) = 4
    assert (r["n_gaps"], r["max_gap"], r["p50_gap"], r["p90_gap"],
            r["n_over"]) == (4, 40, 2, 40, 1)
    assert "solo" not in out  # singleton has no gap


def test_tracking_signal_hand_example(spark):
    """Pins: unbiased alternating errors → 0; all-over forecast →
    −1000 permille; exact forecast → NULLs."""
    from m5_competition_kaggle_spark.operators.tracking_signal import (
        tracking_signal,
    )

    rows = [
        ("alt", 10, 8), ("alt", 10, 12),      # e = +2, −2
        ("over", 5, 9), ("over", 5, 7),       # e = −4, −2
        ("exact", 3, 3),
        ("warm", 3, None),
    ]
    df = spark.createDataFrame(
        rows, "k string, y bigint, yhat bigint"
    )
    got = {r["k"]: r for r in tracking_signal(
        df, "k", "y", "yhat").collect()}
    assert (got["alt"]["err_sum"], got["alt"]["bias_permille"],
            got["alt"]["ts_x100"]) == (0, 0, 0)
    assert got["over"]["bias_permille"] == -1000
    assert got["over"]["ts_x100"] == 100 * -6 * 2 // 6
    assert got["exact"]["bias_permille"] is None
    assert "warm" not in got  # all-NULL forecasts drop the key


def test_vacuity_sf001_audits(spark):
    """Round-7 lesson: every certificate must do real work at the
    certification SF. All four SBC quadrants carry mass; silhouette
    clusters disagree; coverage varies with α; daily AUC varies."""
    sbc = extensions_r9b.x141_sbc_classes(spark, SF01)
    classes = {
        r["sbc_class"]: r["cnt"]
        for r in sbc.groupBy("sbc_class")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(classes) == {"smooth", "erratic", "intermittent",
                            "lumpy"}

    sil = extensions_r9b.x142_silhouette(spark, SF01).collect()
    assert len(sil) == 10
    assert len({r["mean_s_ppm"] for r in sil}) > 1

    iv = extensions_r9b.x143_interval_score(spark, SF01).collect()
    assert len(iv) == 15  # 5 event types × 3 alphas
    by_alpha = {}
    for r in iv:
        by_alpha.setdefault(r["alpha"], []).append(r["cover_permille"])
    # wider intervals (smaller α) must not cover less on average
    m = {a: sum(v) / len(v) for a, v in by_alpha.items()}
    assert m[50] >= m[200] >= m[500]
    assert any(r["n_in"] < r["n_eval"] for r in iv)  # misses exist

    auc = extensions_r9b.x144_day_auc(spark, SF01).collect()
    assert len(auc) == 30
    assert len({r["auc_ppm"] for r in auc}) > 1

    s21 = extensions_r9b.s21_stream_auc(spark, SF01).collect()
    assert len(s21) == 30
    assert len({r["auc_ppm"] for r in s21}) > 1

    ece = extensions_r9b.x145_calibration_ece(spark, SF01).collect()
    assert len(ece) == 1 and ece[0]["ece_ppm"] > 0
    assert ece[0]["mce_permille"] >= ece[0]["ece_ppm"] // 1000

    gaps = extensions_r9b.x146_demand_gaps(spark, SF01).collect()
    assert len(gaps) > 50
    assert any(r["n_over"] > 0 for r in gaps)
    assert any(r["p90_gap"] > r["p50_gap"] for r in gaps)

    ts = extensions_r9b.x147_tracking_signal(spark, SF01).collect()
    assert len(ts) == 5
    assert len({r["ts_x100"] for r in ts}) > 1
    assert all(r["abs_err_sum"] > 0 for r in ts)
