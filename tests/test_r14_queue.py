"""Staged certification for the round-14 queue
(queries/extensions_r14.py — x171 Markov surprisal, x172 sales Gini,
x173 cross-covariance lead-lag, x174 doc KL novelty, x175 CvM drift,
s26 streaming CvM; x198/x199 added r13; x67b added r13 second
session). Staged two rounds ahead; same local gate as the
r10-r13 queues: the check_oracle differential at sf0.001 AND sf0.01,
hand pins, vacuity audits, and the stream==batch identity for s26."""

from __future__ import annotations

import importlib.util
import os
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r14
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


@pytest.mark.parametrize("name", sorted(extensions_r14.QUERIES))
def test_differential_vs_duckdb(spark, name):
    sdf = extensions_r14.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r14.ORACLES[name]).arrow()
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


@pytest.mark.parametrize("name", sorted(extensions_r14.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    sdf = extensions_r14.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r14.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


# ------------------------------------------------------- gini pins


def test_gini_uniform_is_zero(spark):
    """Equal values => perfect equality => gini_ppm == 0 exactly."""
    from m5_competition_kaggle_spark.operators.gini import (
        gini_by_group,
    )

    df = spark.createDataFrame(
        [("g", 7)] * 10, "grp string, v long"
    )
    row = gini_by_group(df, ["grp"], "v").collect()[0]
    assert row["gini_ppm"] == 0
    assert row["n_members"] == 10 and row["total"] == 70
    assert row["top_share_ppm"] == 100_000


def test_gini_max_concentration_closed_form(spark):
    """One member owns everything among n => G = (n-1)/n exactly."""
    from m5_competition_kaggle_spark.operators.gini import (
        gini_by_group,
    )

    n = 8
    rows = [("g", 0)] * (n - 1) + [("g", 1000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    row = gini_by_group(df, ["grp"], "v").collect()[0]
    assert row["gini_ppm"] == (1_000_000 * (n - 1)) // n
    assert row["top_share_ppm"] == 1_000_000


def test_gini_tie_order_invariance(spark):
    """The cell closed form is tie-order invariant: permuting input
    rows (ties included) cannot move any output integer."""
    from m5_competition_kaggle_spark.operators.gini import (
        gini_by_group,
    )

    rows = [("g", v) for v in (5, 0, 5, 9, 0, 2, 5, 9)]
    a = gini_by_group(
        spark.createDataFrame(rows, "grp string, v long"),
        ["grp"], "v",
    ).collect()
    b = gini_by_group(
        spark.createDataFrame(rows[::-1], "grp string, v long"),
        ["grp"], "v",
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_gini_all_zero_group_is_null(spark):
    from m5_competition_kaggle_spark.operators.gini import (
        gini_by_group,
    )

    df = spark.createDataFrame(
        [("z", 0), ("z", 0)], "grp string, v long"
    )
    row = gini_by_group(df, ["grp"], "v").collect()[0]
    assert row["gini_ppm"] is None and row["top_share_ppm"] is None


def test_gini_brute_force_reference(spark):
    """Randomized pin: the cell closed form equals the textbook
    sorted-rank formula computed in plain Python."""
    import random

    from m5_competition_kaggle_spark.operators.gini import (
        gini_by_group,
    )

    rng = random.Random(414)
    vals = [rng.randrange(0, 50) for _ in range(40)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, v long"
    )
    row = gini_by_group(df, ["grp"], "v").collect()[0]
    s = sorted(vals)
    n, tot = len(s), sum(s)
    rank_mass = sum((i + 1) * q for i, q in enumerate(s))
    assert row["rank_mass"] == rank_mass
    assert row["gini_ppm"] == (
        1_000_000 * (2 * rank_mass - (n + 1) * tot)
    ) // (n * tot)


# ----------------------------------------------------- markov pins


def test_surprisal_deterministic_chain_is_zero(spark):
    """A corpus whose grammar is a deterministic cycle has P = 1 on
    every observed transition => surprisal exactly 0."""
    from m5_competition_kaggle_spark.operators.markov import (
        transition_surprisal,
    )

    rows = [("u", i, "ABC"[i % 3]) for i in range(9)]
    df = spark.createDataFrame(rows, "k string, t long, s string")
    out = transition_surprisal(df, "k", "s", ("t",)).collect()
    assert len(out) == 1
    assert out[0]["n_trans"] == 8
    assert out[0]["sum_surprisal_unat"] == 0
    assert out[0]["mean_surprisal_unat"] == 0


def test_surprisal_rare_transition_scores_higher(spark):
    """A user taking a 1-in-many transition must out-score users on
    the majority path, and the rare pair's exact micro-nat surprisal
    is L(c_a) - L(c_ab)."""
    import math

    from m5_competition_kaggle_spark.operators.markov import (
        transition_surprisal,
    )

    rows = []
    for u in range(9):  # nine conformers: A -> B
        rows += [(f"c{u}", 0, "A"), (f"c{u}", 1, "B")]
    rows += [("odd", 0, "A"), ("odd", 1, "Z")]  # one deviant: A -> Z
    df = spark.createDataFrame(rows, "k string, t long, s string")
    got = {
        r["key"]: r["mean_surprisal_unat"]
        for r in transition_surprisal(df, "k", "s", ("t",)).collect()
    }
    expected_rare = round(math.log(10) * 1e6) - round(
        math.log(1) * 1e6
    )
    expected_common = round(math.log(10) * 1e6) - round(
        math.log(9) * 1e6
    )
    assert got["odd"] == expected_rare
    assert got["c0"] == expected_common
    assert got["odd"] > got["c0"]


def test_surprisal_single_event_timelines_drop(spark):
    from m5_competition_kaggle_spark.operators.markov import (
        transition_surprisal,
    )

    rows = [("a", 0, "X"), ("a", 1, "Y"), ("lone", 0, "X")]
    df = spark.createDataFrame(rows, "k string, t long, s string")
    keys = {
        r["key"]
        for r in transition_surprisal(df, "k", "s", ("t",)).collect()
    }
    assert keys == {"a"}


# -------------------------------------------------------- cvm pins


def test_cvm_identical_sides_zero_energy(spark):
    from m5_competition_kaggle_spark.operators.cvm import (
        cvm_statistic,
    )

    side = spark.createDataFrame(
        [("g", v) for v in (1, 2, 2, 3, 5, 8)], "grp string, q long"
    )
    row = cvm_statistic(side, side, "grp", "q").collect()[0]
    assert row["gap_energy"] == 0 and row["omega2_micro"] == 0


def test_cvm_disjoint_supports_closed_form(spark):
    """ref all at q=0, cmp all at q=1, n == m: the only nonzero gap
    cell is q=0 with gap_pm = 1000, carrying c = n pooled mass =>
    gap_energy = n * 10^6 and omega2_micro = 500000 exactly."""
    from m5_competition_kaggle_spark.operators.cvm import (
        cvm_statistic,
    )

    n = 6
    ref = spark.createDataFrame(
        [("g", 0)] * n, "grp string, q long"
    )
    cmp_w = spark.createDataFrame(
        [("g", 1)] * n, "grp string, q long"
    )
    row = cvm_statistic(ref, cmp_w, "grp", "q").collect()[0]
    assert row["n_cells"] == 2
    assert row["gap_energy"] == n * 1_000_000
    assert row["omega2_micro"] == 500_000


def test_cvm_sees_broad_drift_ks_underweights(spark):
    """The motivating separation: a constant shift of a wide uniform
    support keeps the KS max gap small but spreads it across every
    cell — CvM's energy integrates it. Both statistics are computed
    from the same cells; assert CvM's normalized effect exceeds the
    squared KS permille's share, i.e. the energy is NOT concentrated
    at the argmax cell."""
    from m5_competition_kaggle_spark.operators.cvm import (
        cvm_statistic,
    )
    from m5_competition_kaggle_spark.operators.ksdist import (
        ks_statistic,
    )

    ref = spark.createDataFrame(
        [("g", v) for v in range(100)], "grp string, q long"
    )
    cmp_w = spark.createDataFrame(
        [("g", v + 5) for v in range(100)], "grp string, q long"
    )
    ks = ks_statistic(ref, cmp_w, "grp", "q").collect()[0]
    cvm = cvm_statistic(ref, cmp_w, "grp", "q").collect()[0]
    assert ks["ks_permille"] == 50  # 5/100 point shift
    # energy if ONLY the argmax cell gapped: pooled mass there (2) x
    # gap_pm^2; actual energy is two orders larger because ~all 105
    # cells carry the 50-permille gap.
    assert cvm["gap_energy"] > 50 * (2 * ks["ks_permille"] ** 2)
    assert cvm["omega2_micro"] > 0


# ---------------------------------------------- s26 stream == batch


def test_stream_cvm_equals_batch_trajectory(spark):
    """The file-source streaming CvM monitor must emit the identical
    per-day table as the certified batch twin (s26), including when
    the files arrive as separate triggers (state merged, not
    double-counted)."""
    from m5_competition_kaggle_spark.queries.extensions_r14 import (
        SPLIT_NS,
        s26_stream_cvm,
    )
    from m5_competition_kaggle_spark.sources.catalog import (
        load_table,
    )
    from m5_competition_kaggle_spark.streaming.cvm_monitor import (
        streaming_cvm_trajectory,
    )

    ev = load_table(spark, SF, "events")
    ref_counts = (
        ev.filter(F.col("ts_nanos") < F.lit(SPLIT_NS))
        .groupBy(F.expr("CAST(round(value) AS BIGINT)").alias("q"))
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    expected = sorted(
        (str(r.day), r.n_ref, r.n_cmp, r.n_cells, r.gap_energy,
         r.omega2_micro)
        for r in s26_stream_cvm(spark, SF).collect()
    )
    assert expected, "batch twin produced no rows"

    d = tempfile.mkdtemp(prefix="events_cvm_stream_")
    ckpt = tempfile.mkdtemp(prefix="cvm_ckpt_")
    sink: list = []
    try:
        # stage as TWO files so days straddle trigger batches
        mid = ev.approxQuantile("ts_nanos", [0.5], 0.0)[0]
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
        q = streaming_cvm_trajectory(
            spark, d, ref_counts, SPLIT_NS, sink, ckpt,
            maxFilesPerTrigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            (str(r.day), r.n_ref, r.n_cmp, r.n_cells, r.gap_energy,
             r.omega2_micro)
            for r in sink
        )
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


# -------------------------------------------------- fixture vacuity


def test_xcov_peaks_and_bounds(spark):
    """Every pair's peak rows carry ratio exactly +/-1000; every
    ratio is inside [-1000, 1000]; the profile is nondegenerate."""
    out = extensions_r14.x173_xcov_leadlag(spark, SF01).collect()
    assert len(out) == 150  # C(5,2) pairs x 15 lags
    by_pair: dict = {}
    for r in out:
        by_pair.setdefault((r["type_a"], r["type_b"]), []).append(r)
    assert len(by_pair) == 10
    for rows in by_pair.values():
        peaks = [r for r in rows if r["is_peak"]]
        assert peaks, "every pair attains its own max"
        for p in peaks:
            assert abs(p["ratio_permille"]) == 1000
        assert all(
            abs(r["ratio_permille"]) <= 1000
            for r in rows
            if r["ratio_permille"] is not None
        )
    ratios = {r["ratio_permille"] for r in out}
    assert len(ratios) > 10


def test_kl_novelty_output_shape(spark):
    """Top-15 is strictly ordered, all above the corpus-typical
    level (positive micro-nats), all past the token floor."""
    out = extensions_r14.x174_doc_kl_novelty(spark, SF01).collect()
    assert len(out) == 15
    assert all(r["n_tokens"] >= 20 for r in out)
    assert all(r["kl_unat"] > 0 for r in out)
    keys = [(r["kl_unat"], -r["doc_id"]) for r in out]
    assert keys == sorted(keys, reverse=True)


def test_markov_surprisal_nondegenerate(spark):
    out = extensions_r14.x171_markov_surprisal(spark, SF01).collect()
    assert len(out) == 15
    assert all(r["n_trans"] >= 5 for r in out)
    assert all(r["mean_surprisal_unat"] > 0 for r in out)
    assert len({r["mean_surprisal_unat"] for r in out}) > 5


def test_sales_gini_nondegenerate(spark):
    """All 25 brands present, every Gini strictly inside (0, 1) —
    the fixture has both zero-sales parts and heavy sellers — and the
    exact identity rank_mass vs total/n implied bounds hold."""
    out = extensions_r14.x172_sales_gini(spark, SF01).collect()
    assert len(out) == 25
    for r in out:
        assert 0 < r["gini_ppm"] < 1_000_000
        assert 0 < r["top_share_ppm"] <= 1_000_000
        # floor-div identity: gini reconstructs from the integers
        g = (
            1_000_000
            * (2 * r["rank_mass"] - (r["n_members"] + 1) * r["total"])
        ) // (r["n_members"] * r["total"])
        assert r["gini_ppm"] == g
    assert len({r["gini_ppm"] for r in out}) > 10


# ------------------------------------------- x198/x199 pins (r13-added)


def _write_embeddings(spark, rows, d):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )


def test_truncation_recall_perfect_when_tail_dims_zero(spark):
    """Embeddings whose last 32 dims are all zero lose NOTHING under
    truncation: every query's truncated top-10 equals the full top-10
    — recall_permille ≡ 1000, corpus_matched == 10·n_queries."""
    import random

    rng = random.Random(7)
    rows = [
        (
            i,
            [rng.uniform(-1, 1) for _ in range(32)] + [0.0] * 32,
            "a",
        )
        for i in range(60)
    ]
    d = tempfile.mkdtemp(prefix="x198_zero_tail_")
    try:
        _write_embeddings(spark, rows, d)
        out = extensions_r14.x198_dim_truncation_recall(
            spark, d
        ).collect()
        assert len(out) == 2  # vec_id 0 and 50
        for r in out:
            assert r["n_matched"] == 10
            assert r["recall_permille"] == 1000
            assert r["corpus_matched"] == 20
            assert r["n_queries"] == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_truncation_recall_detects_tail_dim_information(spark):
    """Adversarial corpus: first 32 dims IDENTICAL across vectors,
    all separation in the tail — the truncated ranking is then pure
    tie-break noise and the audit must NOT report perfect recall for
    every query (computed against a numpy brute force, not a guess)."""
    import random

    import numpy as np

    rng = random.Random(11)
    head = [1.0] * 32
    rows = [
        (i, head + [rng.uniform(-1, 1) for _ in range(32)], "a")
        for i in range(60)
    ]
    d = tempfile.mkdtemp(prefix="x198_tail_info_")
    try:
        _write_embeddings(spark, rows, d)
        out = {
            r["query_id"]: r
            for r in extensions_r14.x198_dim_truncation_recall(
                spark, d
            ).collect()
        }
        # numpy reference: quantized dots, (dot desc, id asc) top-10
        q = np.array(
            [[round(x * 1000) for x in rows[i][1]] for i in range(60)],
            dtype=np.int64,
        )
        def topk(mat, qi):
            dots = mat @ mat[qi]
            order = sorted(
                (int(n) for n in range(60) if n != qi),
                key=lambda n: (-dots[n], n),
            )
            return set(order[:10])
        for qi in (0, 50):
            full = topk(q, qi)
            half = topk(q[:, :32], qi)
            expect = len(full & half)
            assert out[qi]["n_matched"] == expect
            assert out[qi]["recall_permille"] == expect * 1000 // 10
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _write_docs(spark, rows, d):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )


def test_dedup_config_rand_is_one_for_exact_dup_families(spark):
    """Three families of EXACT duplicates (jaccard 1.0 inside, ~0
    across): both thresholds produce the identical clustering, so
    every pair-count component coincides and rand_ppm == 10⁶."""
    fam = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet colors",
    ]
    rows = []
    for i in range(12):
        rows.append((i, fam[i % 3], "en", "s"))
    # plus singletons that match nothing
    rows += [
        (100, "completely unrelated text about spark engines", "en", "s"),
        (101, "another standalone document mentioning duckdb", "en", "s"),
    ]
    d = tempfile.mkdtemp(prefix="x199_dups_")
    try:
        _write_docs(spark, rows, d)
        r = extensions_r14.x199_dedup_config_stability(
            spark, d
        ).collect()[0]
        assert r["n_docs"] == 14
        assert r["total_pairs"] == 14 * 13 // 2
        # 3 families of 4 -> C(4,2)*3 = 18 same-pairs on both sides
        assert r["pairs_a"] == r["pairs_b"] == r["pairs_both"] == 18
        assert r["rand_ppm"] == 1_000_000
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_dedup_config_rand_nested_threshold_invariant(spark):
    """0.8-pairs ⊆ 0.7-pairs ⇒ the tight clustering REFINES the loose
    one, so every same-pair under A is a same-pair under B:
    pairs_both == pairs_a exactly, and rand_ppm reduces to
    10⁶·(total − (pairs_b − pairs_a)) DIV total — checked on the real
    corpus at sf0.001."""
    r = extensions_r14.x199_dedup_config_stability(
        spark, SF
    ).collect()[0]
    assert r["pairs_both"] == r["pairs_a"]
    assert r["pairs_a"] <= r["pairs_b"]
    total = r["total_pairs"]
    assert r["rand_ppm"] == (
        1_000_000 * (total - (r["pairs_b"] - r["pairs_a"]))
    ) // total


# ------------------------------------------------ x67b pins (r13-added)


def _write_events_x67b(spark, rows, d):
    """rows: (event_id, epoch_nanos, user_id, event_type)."""
    spark.createDataFrame(
        rows,
        "event_id long, __ns long, user_id long, event_type string",
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


# 2024-01-01 00:00:00 UTC in epoch nanos — a 1-minute cell boundary.
_T0 = 1_704_067_200_000_000_000
_SEC = 1_000_000_000


def test_interval_cells_window_membership(spark):
    """The cell-aligned contract, pinned where it DIFFERS from x67's
    event-anchored windows: an event EARLIER in the error's own cell
    is INSIDE (x67 would exclude: tsn < w_start); an event < 30 min
    after the error but in cell c0+30 is OUTSIDE (x67 would include).
    Cell c0+29 is the last included cell."""
    rows = [
        (100, _T0 + 30 * _SEC, 1, "error"),          # anchor, cell c0
        (1, _T0 + 10 * _SEC, 2, "view"),             # c0, before anchor
        (2, _T0 + (29 * 60 + 50) * _SEC, 2, "view"),  # cell c0+29: in
        (3, _T0 + (30 * 60 + 10) * _SEC, 3, "view"),  # cell c0+30: out
    ]
    d = tempfile.mkdtemp(prefix="x67b_membership_")
    try:
        _write_events_x67b(spark, rows, d)
        out = extensions_r14.x67b_interval_cells(spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert r["incident_id"] == 100
        assert r["n_events"] == 3          # ids 1, 100, 2 — not 3
        assert r["n_users"] == 2           # users {1, 2}
        assert r["first_tsn"] == _T0 + 10 * _SEC
        assert r["last_tsn"] == _T0 + (29 * 60 + 50) * _SEC
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_interval_cells_density_absorption(spark):
    """Replicating the non-error events k-fold (fresh event_ids, same
    users/timestamps) scales n_events by exactly k while n_users,
    first_tsn and last_tsn are invariant — the property the per-cell
    pre-aggregate is FOR: density lands in the map-side combine, not
    in the join."""
    base = [
        (100, _T0 + 5 * _SEC, 1, "error"),
        (1, _T0 + 65 * _SEC, 2, "view"),
        (2, _T0 + 125 * _SEC, 3, "click"),
    ]
    k = 5
    dense = list(base)
    nxt = 1000
    for (eid, ns, uid, et) in base:
        if et == "error":
            continue
        for _ in range(k - 1):
            dense.append((nxt, ns, uid, et))
            nxt += 1
    d1 = tempfile.mkdtemp(prefix="x67b_base_")
    d2 = tempfile.mkdtemp(prefix="x67b_dense_")
    try:
        _write_events_x67b(spark, base, d1)
        _write_events_x67b(spark, dense, d2)
        r1 = extensions_r14.x67b_interval_cells(spark, d1).collect()[0]
        r2 = extensions_r14.x67b_interval_cells(spark, d2).collect()[0]
        assert r1["n_events"] == 3
        assert r2["n_events"] == 1 + k * 2  # error + k x 2 views
        for c in ("incident_id", "n_users", "first_tsn", "last_tsn"):
            assert r1[c] == r2[c]
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)
