"""Staged certification for the round-17 queue
(queries/extensions_r17.py — x184 phrase search, x185 followed-by,
x186 path signatures, x187 conversion-lag quantiles; x200
sweep-line concurrency added r13 second session). Staged five
rounds ahead; same local gate as the r10-r16 queues: the check_oracle
differential at sf0.001 AND sf0.01, hand pins, vacuity audits."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r17
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


@pytest.mark.parametrize("name", sorted(extensions_r17.QUERIES))
def test_differential_vs_duckdb(spark, name):
    sdf = extensions_r17.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r17.ORACLES[name]).arrow()
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


@pytest.mark.parametrize("name", sorted(extensions_r17.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    sdf = extensions_r17.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r17.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


# ------------------------------------------------------- x184 pins


def test_phrase_search_counts_are_adjacency_counts(spark):
    """The winning phrase's total occurrences must equal the direct
    count of adjacent positions over the corpus — and every matched
    doc really contains the two tokens adjacently."""
    out = extensions_r17.x184_phrase_search(spark, SF).collect()
    assert out
    w1, w2 = out[0]["phrase_w1"], out[0]["phrase_w2"]
    assert len({(r["phrase_w1"], r["phrase_w2"]) for r in out}) == 1
    from m5_competition_kaggle_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), '[^a-z0-9]+'),"
            " x -> x <> '')"
        ).alias("ws"),
    ).filter(F.size("ws") >= 2)
    direct = docs.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(ws, 1, size(ws) - 1)").alias("a"),
                F.expr("slice(ws, 2, size(ws) - 1)").alias("b"),
            )
        ).alias("bg")
    ).filter(
        (F.col("bg.a") == w1) & (F.col("bg.b") == w2)
    ).count()
    assert sum(r["n_occurrences"] for r in out) == direct
    assert all(
        0 < r["n_docs"] <= r["n_occurrences"] for r in out
    )


# ------------------------------------------------------- x185 pins


def test_followed_by_planted_timeline(spark):
    """Hand-checkable implication: replicate the join arithmetic on a
    planted frame — in-window error counts, at-edge counts, and the
    strictly-after rule (an error AT the purchase instant does not
    count)."""
    W = extensions_r17.FOLLOW_NS
    p = spark.createDataFrame(
        [(1, 10, 1000), (1, 11, 5000), (2, 12, 1000)],
        "user_id long, pid long, pt long",
    )
    e = spark.createDataFrame(
        [(1, 1000), (1, 1000 + W), (2, 1000 + W + 1)],
        "e_user long, et long",
    )
    per_p = (
        p.join(
            e,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("et") > F.col("pt"))
            & (F.col("et") <= F.col("pt") + F.lit(W)),
            "left",
        )
        .groupBy("pid")
        .agg(
            F.max(F.col("et").isNotNull().cast("long")).alias("f")
        )
        .collect()
    )
    got = {r["pid"]: r["f"] for r in per_p}
    # pid 10: error at pt exactly -> excluded (strictly after); the
    # one at pt+W is AT the edge -> included. pid 11: the pt+W error
    # precedes it? et=1000+W > 5000 and <= 5000+W -> included.
    # pid 12: user 2's error is 1 ns past user-2's window start+W?
    # et = 1000+W+1 > 1000 and <= 1000+W? No -> not followed.
    assert got == {10: 1, 11: 1, 12: 0}


def test_followed_by_fixture_bounds(spark):
    out = extensions_r17.x185_followed_by(spark, SF01).collect()
    assert len(out) >= 28
    for r in out:
        assert 0 <= r["n_followed"] <= r["n_purchases"]
        assert 0 <= r["followed_ppm"] <= 1_000_000
    assert any(r["n_followed"] > 0 for r in out)


# ------------------------------------------------------- x186 pins


def test_path_signatures_shape(spark):
    out = extensions_r17.x186_path_signatures(spark, SF01).collect()
    assert 0 < len(out) <= 10
    counts = [r["n_sessions"] for r in out]
    assert counts == sorted(counts, reverse=True)
    types = {"view", "click", "purchase", "signup", "error"}
    for r in out:
        parts = r["signature"].split(">")
        assert len(parts) == len(set(parts))  # first occurrences
        assert set(parts) <= types
    # single-event sessions exist: some signature has no '>'
    assert any(">" not in r["signature"] for r in out)


# ------------------------------------------------------- x187 pins


def test_conversion_quantiles_brute_force(spark):
    """The grouped-cells value-at-rank must equal the sorted-list
    definition computed from the same per-user lags."""
    from m5_competition_kaggle_spark.sources.catalog import load_table

    ev = load_table(spark, SF01, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts_nanos"))
        ).alias("v0"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.col("ts_nanos")
            )
        ).alias("p0"),
    )
    lags = sorted(
        r["lag"]
        for r in firsts.select(
            F.expr(
                "CASE WHEN v0 IS NOT NULL AND p0 IS NOT NULL"
                " AND p0 >= v0 THEN"
                " (p0 - v0) DIV 60000000000 END"
            ).alias("lag")
        ).collect()
        if r["lag"] is not None
    )
    n = len(lags)
    expect = {
        k: lags[max(0, (n * k + 99) // 100 - 1)]
        for k in (10, 50, 90)
    }
    row = extensions_r17.x187_conversion_lag_quantiles(
        spark, SF01
    ).collect()[0]
    assert row["n_converted"] == n
    assert row["p10_min"] == expect[10]
    assert row["p50_min"] == expect[50]
    assert row["p90_min"] == expect[90]
    assert row["p10_min"] <= row["p50_min"] <= row["p90_min"]


# ------------------------------------------------------- x200 pins


def _write_events_x200(spark, rows, d):
    """rows: (event_id, epoch_nanos, user_id)."""
    spark.createDataFrame(
        rows, "event_id long, __ns long, user_id long"
    ).select(
        "event_id",
        F.timestamp_micros(
            (F.col("__ns") / 1000).cast("long")
        ).alias("ts"),
        "user_id",
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )


# 2024-01-01 00:00:00 UTC in epoch nanos (day_idx 19723).
_T0_X200 = 1_704_067_200_000_000_000
_MIN_NS = 60_000_000_000


def test_concurrency_planted_sweep(spark):
    """Hand-walked sweep over four planted sessions, pinning the
    closed-interval rule: user 4's session starts at the SAME micro-
    second user 1's session ends, and the end+1 boundary encoding
    keeps both open at that shared instant — peak 3 (users 1, 3, 4),
    not 2. (Event timestamps are micro-aligned, so a −1 boundary at
    end_ns+1 always sorts strictly after every event at end_ns.)

    Sweep walk: +u1(1) @t · +u2(2) @t+2m · −u2(1) @t+2m+1ns ·
    +u3(2) @t+3m · +u4(3) @t+10m · −u1(2) @t+10m+1ns ·
    −u4(1) @t+10m+1ns(u4) · −u3(0) @t+12m+1ns."""
    import shutil
    import tempfile

    t = _T0_X200
    rows = [
        # user 1: one session [t, t+10min] (gap 10m < 30m merges)
        (1, t, 1),
        (2, t + 10 * _MIN_NS, 1),
        # user 2: session [t+2min, t+2min] (single event)
        (3, t + 2 * _MIN_NS, 2),
        # user 3: session [t+3min, t+12min]
        (4, t + 3 * _MIN_NS, 3),
        (5, t + 12 * _MIN_NS, 3),
        # user 4: single event at user 1's session END instant
        (6, t + 10 * _MIN_NS, 4),
    ]
    d = tempfile.mkdtemp(prefix="x200_sweep_")
    try:
        _write_events_x200(spark, rows, d)
        out = extensions_r17.x200_concurrency_profile(
            spark, d
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["day_idx"] == t // 86_400_000_000_000
        assert r["n_starts"] == 4
        assert r["n_ends"] == 4
        assert r["peak_level"] == 3
        assert r["close_level"] == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_concurrency_conservation_vs_g17(spark):
    """On the real sf0.01 corpus: starts and ends both sum to the
    g17 session count, the final close_level is zero (every opened
    session closes), and every per-day peak is positive and bounded
    by the number of users."""
    from m5_competition_kaggle_spark.queries import analytics

    out = extensions_r17.x200_concurrency_profile(
        spark, SF01
    ).collect()
    n_sessions = analytics.g17_sessionize_gaps(spark, SF01).count()
    assert sum(r["n_starts"] for r in out) == n_sessions
    assert sum(r["n_ends"] for r in out) == n_sessions
    assert out[-1]["close_level"] == 0
    n_users = 150  # sf0.01 user population
    for r in out:
        assert 1 <= r["peak_level"] <= n_users
        assert r["close_level"] >= 0


# ------------------------------------------------------- x208 pins


def test_funnel_strict_order_planted(spark):
    """Hand-built funnel: user 1 converts fully in order; user 2
    purchases BEFORE viewing (strict order says not converted); user
    3 views then purchases but never clicks (stops at view); user 4
    only clicks (clicking without a prior view reaches nothing)."""
    import shutil
    import tempfile

    t = _T0_X200
    m = 60_000_000_000
    rows = [
        (1, t, 1, "view"), (2, t + m, 1, "click"),
        (3, t + 2 * m, 1, "purchase"),
        (4, t, 2, "purchase"), (5, t + m, 2, "view"),
        (6, t, 3, "view"), (7, t + m, 3, "purchase"),
        (8, t, 4, "click"),
    ]
    d = tempfile.mkdtemp(prefix="x208_plant_")
    try:
        spark.createDataFrame(
            rows,
            "event_id long, __ns long, user_id long,"
            " event_type string",
        ).select(
            "event_id",
            F.timestamp_micros(
                (F.col("__ns") / 1000).cast("long")
            ).alias("ts"),
            "user_id",
            "event_type",
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        out = {
            r["step"]: r
            for r in extensions_r17.x208_funnel_steps(
                spark, d
            ).collect()
        }
        assert out["all_users"]["n_reached"] == 4
        assert out["view"]["n_reached"] == 3     # users 1, 2, 3
        assert out["click"]["n_reached"] == 1    # user 1 only
        assert out["purchase"]["n_reached"] == 1
        assert out["all_users"]["retained_ppm"] == 1_000_000
        assert out["view"]["retained_ppm"] == 750_000
        assert out["click"]["retained_ppm"] == 333_333
        assert out["purchase"]["retained_ppm"] == 1_000_000
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_funnel_monotone_on_corpus(spark):
    """Reach counts are monotone nonincreasing down the funnel and
    every retained_ppm is a valid floor-ppm."""
    out = extensions_r17.x208_funnel_steps(spark, SF01).collect()
    assert [r["step_idx"] for r in out] == [0, 1, 2, 3]
    ns = [r["n_reached"] for r in out]
    assert ns == sorted(ns, reverse=True)
    assert ns[-1] > 0  # purchases do happen in order somewhere
    for r in out:
        assert 0 <= r["retained_ppm"] <= 1_000_000
