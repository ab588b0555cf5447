"""Staged certification for the round-18 queue
(queries/extensions_r18.py — x188 dedup-weighted stats, x189 source
KS matrix, x190 diurnal profile, s29 stateful conversions; x201
degree assortativity added r13 second session). Staged
six rounds ahead; same local gate as the r10-r17 queues: the
check_oracle differential at sf0.001 AND sf0.01, hand pins, vacuity
audits, and the shuffled-batch convergence property for s29."""

from __future__ import annotations

import importlib.util
import os
import random
import shutil
import tempfile

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r18
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


@pytest.mark.parametrize("name", sorted(extensions_r18.QUERIES))
def test_differential_vs_duckdb(spark, name):
    sdf = extensions_r18.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r18.ORACLES[name]).arrow()
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


@pytest.mark.parametrize("name", sorted(extensions_r18.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    sdf = extensions_r18.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r18.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


# ------------------------------------------------------- x188 pins


def test_dedup_stats_mass_identities(spark):
    """Kept <= raw everywhere; the corpus-wide dropped-doc count
    equals the cluster operator's non-canonical member count; a
    source with no dup clusters keeps everything (ppm == 10^6)."""
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from m5_competition_kaggle_spark.operators.graph import (
        dedup_clusters,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table

    out = extensions_r18.x188_dedup_weighted_stats(
        spark, SF
    ).collect()
    assert len(out) == 20
    for r in out:
        assert 0 <= r["n_docs_kept"] <= r["n_docs"]
        assert 0 <= r["n_tokens_kept"] <= r["n_tokens"]
        assert (r["doc_keep_ppm"] == 1_000_000) == (
            r["n_docs_kept"] == r["n_docs"]
        )
    docs = load_table(spark, SF, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.8,
    ).select("id_a", "id_b")
    n_dropped = (
        dedup_clusters(pairs).filter(~F.col("is_canonical")).count()
    )
    assert sum(r["n_docs"] - r["n_docs_kept"] for r in out) == \
        n_dropped
    assert n_dropped > 0  # the fixture has dup families


# ------------------------------------------------------- x189 pins


def test_source_ks_matrix_shape_and_self_consistency(spark):
    """10 unordered pairs of the top-5 sources, KS in [0, 1000], and
    the pair sides' totals equal the per-source doc counts."""
    from m5_competition_kaggle_spark.sources.catalog import load_table

    out = extensions_r18.x189_source_ks_matrix(spark, SF01).collect()
    assert len(out) == 10
    counts = {
        r["source"]: r["n"]
        for r in load_table(spark, SF01, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in out:
        assert r["src_a"] < r["src_b"]
        assert r["n_ref"] == counts[r["src_a"]]
        assert r["n_cmp"] == counts[r["src_b"]]
        assert 0 <= r["ks_permille"] <= 1000
    assert len({r["ks_permille"] for r in out}) > 1


# ------------------------------------------------------- x190 pins


def test_diurnal_profile_full_grid(spark):
    out = extensions_r18.x190_diurnal_profile(spark, SF01).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_hours"] == 24
        assert 0 <= r["peak_hour"] <= 23
        assert r["peak_count"] <= r["total"]
        assert 0 <= r["gini_ppm"] < 1_000_000
        # 24 uniform hours would be ~41,667 ppm top share; peak must
        # be at least the uniform share by definition of max
        assert r["top_share_ppm"] * 24 >= 1_000_000 - 24


def test_diurnal_empty_hours_raise_gini(spark):
    """A synthetic business-hours stream (all mass in 8 of 24 hours,
    uniform there) must read MORE concentrated than a full-day
    uniform stream — the zero hours hold ranks. Closed form: G =
    16/24 exactly for the 8-hour uniform."""
    from m5_competition_kaggle_spark.operators.gini import (
        gini_by_group,
    )

    rows = [("t", h, 10 if h < 8 else 0) for h in range(24)]
    df = spark.createDataFrame(
        rows, "event_type string, hour long, cnt long"
    )
    g = gini_by_group(df, ["event_type"], "cnt").collect()[0]
    assert g["gini_ppm"] == (1_000_000 * 16) // 24


# ----------------------------------------------- s29 stateful pins


def test_s29_matches_x183_aggregate(spark):
    """The per-user table aggregates to exactly x183's summary row
    (the marginal identity)."""
    from m5_competition_kaggle_spark.queries.extensions_r16 import (
        x183_conversion_lag,
    )

    users = extensions_r18.s29_user_conversions(
        spark, SF01
    ).collect()
    summary = x183_conversion_lag(spark, SF01).collect()[0]
    assert len(users) == summary["n_viewers"]
    lags = [r["lag_min"] for r in users if r["lag_min"] is not None]
    assert len(lags) == summary["n_converted"]
    assert sum(lags) == summary["sum_lag_min"]
    assert min(lags) == summary["min_lag_min"]
    assert max(lags) == summary["max_lag_min"]


def test_conversion_kernel_shuffle_invariance(spark):
    """Min is commutative: folding random batches in ANY order (even
    time-shuffled — no ordering contract) converges to the
    whole-timeline firsts."""
    from m5_competition_kaggle_spark.streaming.conversion_state import (
        _firsts_from_frame,
    )

    rng = random.Random(2929)
    for trial in range(20):
        n = rng.randrange(1, 25)
        events = [
            (
                rng.randrange(0, 10**6),
                rng.choice(["view", "purchase"]),
            )
            for _ in range(n)
        ]
        views = [t for t, e in events if e == "view"]
        purch = [t for t, e in events if e == "purchase"]
        expected = (
            min(views) if views else None,
            min(purch) if purch else None,
        )
        shuffled = events[:]
        rng.shuffle(shuffled)
        k = rng.randrange(1, 5)
        cuts = sorted(rng.sample(range(0, n), min(k, n)))
        state = (None, None)
        prev = 0
        for c in cuts + [n]:
            if c > prev:
                b = shuffled[prev:c]
                pdf = pd.DataFrame(
                    {
                        "tsn": [t for t, _ in b],
                        "event_type": [e for _, e in b],
                    }
                )
                state = _firsts_from_frame(pdf, *state)
                prev = c
        assert state == expected, trial


def test_s29_stream_converges_across_batches(spark):
    """The applyInPandasWithState twin over a two-file stream: the
    LAST emitted row per user equals the batch table — including
    users whose view and purchase land in DIFFERENT micro-batches."""
    from m5_competition_kaggle_spark.sources.catalog import load_table
    from m5_competition_kaggle_spark.streaming.conversion_state import (
        stateful_user_conversions,
    )
    from m5_competition_kaggle_spark.streaming.events import (
        read_events_stream,
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
    d = tempfile.mkdtemp(prefix="events_conv_stream_")
    ckpt = tempfile.mkdtemp(prefix="conv_ckpt_")
    try:
        for name, part in (
            ("a", ev.filter(F.col("ts_nanos") < mid)),
            ("b", ev.filter(F.col("ts_nanos") >= mid)),
        ):
            tmp = os.path.join(d, f"__{name}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            for f in os.listdir(tmp):
                if f.endswith(".parquet"):
                    shutil.move(
                        os.path.join(tmp, f),
                        os.path.join(d, f"part-{name}.parquet"),
                    )
            shutil.rmtree(tmp)
        stream = read_events_stream(
            spark, d, maxFilesPerTrigger=1
        ).filter(
            F.col("event_type").isin("view", "purchase")
        ).select(
            "user_id",
            F.col("ts_nanos").alias("tsn"),
            "event_type",
        )
        out = stateful_user_conversions(stream)
        q = (
            out.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .format("memory")
            .queryName("s29_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # LAST emission per user (update mode re-emits refreshed rows)
        pdf = spark.sql("SELECT * FROM s29_out").toPandas()
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
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.catalog.dropTempView("s29_out")


# ------------------------------------------------------- x201 pins


def _write_docs_x201(spark, rows, d):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )


_TEXT_A = "alpha bravo charlie delta echo foxtrot golf hotel"
_TEXT_B = "india juliet kilo lima mike november oscar papa"


def test_assortativity_disjoint_cliques_is_one(spark):
    """Two families of exact duplicates (3 copies of A, 4 of B, no
    shared shingles) form disjoint cliques K3 ∪ K4: every edge joins
    equal degrees (2-2 or 3-3), degrees VARY across cliques, so
    Newman's r is exactly +1 → assort_ppm == 1_000_000, alongside
    the closed-form edge/degree sums."""
    rows = [(i, _TEXT_A, "en", "s") for i in range(3)] + [
        (10 + i, _TEXT_B, "en", "s") for i in range(4)
    ]
    d = tempfile.mkdtemp(prefix="x201_cliques_")
    try:
        _write_docs_x201(spark, rows, d)
        r = extensions_r18.x201_degree_assortativity(
            spark, d
        ).collect()[0]
        assert r["n_nodes"] == 7
        # K3: 3 directed-edge pairs*2=6; K4: 12 -> m = 18
        assert r["m_directed"] == 18
        # sum_src_deg = sum_v deg^2 = 3*4 + 4*9 = 48
        assert r["sum_src_deg"] == 48
        # within cliques j == k: sum j*k = 6*4 + 12*9 = 132
        assert r["sum_deg_prod"] == 132
        assert r["sum_src_deg_sq"] == 132
        assert r["assort_ppm"] == 1_000_000
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_assortativity_regular_graph_is_null(spark):
    """One family of 4 exact duplicates is K4 — a regular graph:
    the Pearson denominator m·Σj² − (Σj)² is exactly 0, so
    assort_ppm must be NULL (not a division blowup)."""
    rows = [(i, _TEXT_A, "en", "s") for i in range(4)]
    d = tempfile.mkdtemp(prefix="x201_regular_")
    try:
        _write_docs_x201(spark, rows, d)
        r = extensions_r18.x201_degree_assortativity(
            spark, d
        ).collect()[0]
        assert r["n_nodes"] == 4
        assert r["m_directed"] == 12
        assert r["assort_ppm"] is None
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_assortativity_corpus_bounds(spark):
    """Real-corpus sanity at sf0.01: |r| <= 1 in ppm, the directed
    edge count is even, and the edge-endpoint sums satisfy the
    m = Σ_v deg_v identity (sum over directed edges of 1 = m; Σj
    equals Σ_v deg_v² >= m when every degree >= 1)."""
    r = extensions_r18.x201_degree_assortativity(
        spark, SF01
    ).collect()[0]
    assert r["m_directed"] % 2 == 0
    assert r["m_directed"] >= 2
    assert r["sum_src_deg"] >= r["m_directed"]
    assert r["sum_deg_prod"] >= r["m_directed"]
    if r["assort_ppm"] is not None:
        assert -1_000_000 <= r["assort_ppm"] <= 1_000_000


# ------------------------------------------------------- x207 pins


def test_quality_shift_cross_pins_x188(spark):
    """Same dropped set, same grouping: x207's population columns
    must equal x188's exactly (per source, sf0.001)."""
    a = {
        r["source"]: r
        for r in extensions_r18.x188_dedup_weighted_stats(
            spark, SF
        ).collect()
    }
    b = {
        r["source"]: r
        for r in extensions_r18.x207_dedup_quality_shift(
            spark, SF
        ).collect()
    }
    assert a.keys() == b.keys()
    for src in a:
        assert b[src]["n_docs"] == a[src]["n_docs"]
        assert b[src]["n_kept"] == a[src]["n_docs_kept"]


def test_quality_shift_planted_boilerplate_drop(spark):
    """Three copies of an all-monosyllable text (grade 5000) plus one
    unique polysyllabic doc (grade 20000): dedup keeps one of each,
    so mean_all = 35000 DIV 4 = 8750, mean_kept = 25000 DIV 2 =
    12500, shift = +3750 — dropping boilerplate RAISES the surviving
    grade, with every number closed-form."""
    mono = "the big fast sort with a top key for the new map"
    poly = (
        "customer window merger patterns deliver analytic"
        " pipelines over resilient partition boundaries"
    )
    rows = [(i, mono, "en", "s") for i in range(3)] + [
        (10, poly, "en", "s")
    ]
    d = tempfile.mkdtemp(prefix="x207_plant_")
    try:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        r = extensions_r18.x207_dedup_quality_shift(
            spark, d
        ).collect()[0]
        assert r["n_docs"] == 4 and r["n_kept"] == 2
        assert r["n_scored"] == 4 and r["n_scored_kept"] == 2
        assert r["mean_grade_all"] == 8750
        assert r["mean_grade_kept"] == 12500
        assert r["shift_milli"] == 3750
    finally:
        shutil.rmtree(d, ignore_errors=True)
