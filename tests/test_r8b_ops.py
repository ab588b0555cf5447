"""Unit tests for the round-8-queue second-batch operators (privacy,
agreement, calibration, graph_coeff, psi) on tiny hand-checked inputs
— the oracle harness certifies the registered queries end-to-end;
these pin the operator semantics the fixtures don't isolate."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.agreement import (
    kappa_contingency,
)
from m5_competition_kaggle_spark.operators.calibration import (
    calibration_bins,
)
from m5_competition_kaggle_spark.operators.graph_coeff import (
    local_clustering,
)
from m5_competition_kaggle_spark.operators.privacy import (
    k_anonymity_profile,
)
from m5_competition_kaggle_spark.operators.psi import psi_terms


# --------------------------------------------------------------- privacy


def test_k_anonymity_histogram(spark):
    # classes: (a,) x3 rows sens {1,1,2}; (b,) x1 row sens {9}
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 9)], "q string, s int"
    )
    out = {
        r.class_size: r
        for r in k_anonymity_profile(df, ["q"], "s", k=2).collect()
    }
    assert out[3].n_classes == 1 and out[3].n_rows == 3
    assert out[3].min_ldiv == 2 and out[3].violates_k == 0
    assert out[1].n_classes == 1 and out[1].min_ldiv == 1
    assert out[1].violates_k == 1


def test_k_anonymity_min_ldiv_is_worst_of_size(spark):
    # two size-2 classes: one with 2 distinct sens, one with 1
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 7), ("b", 7)], "q string, s int"
    )
    rows = k_anonymity_profile(df, ["q"], "s", k=5).collect()
    assert len(rows) == 1
    assert rows[0].class_size == 2 and rows[0].n_classes == 2
    assert rows[0].min_ldiv == 1  # the all-same-sensitive class
    assert rows[0].violates_k == 1


def test_k_anonymity_k_guard(spark):
    df = spark.createDataFrame([("a", 1)], "q string, s int")
    with pytest.raises(ValueError, match="k must be >= 1"):
        k_anonymity_profile(df, ["q"], "s", k=0)


# ------------------------------------------------------------- agreement


def test_kappa_perfect_agreement(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2), (0, 0)], "a int, b int"
    )
    r = kappa_contingency(df, "a", "b").collect()[0]
    # po = 1, kappa = 1 -> permille 1000
    assert r.kappa_num == r.kappa_den
    assert r.kappa_permille == 1000


def test_kappa_hand_computed(spark):
    # classic 2x2: n=100, diag=70 (45 yes-yes, 25 no-no)
    # rater A: 50 yes / 50 no; rater B: 55 yes / 45 no
    # e = 50*55 + 50*45 = 5000; kappa = (100*70-5000)/(10000-5000) = 0.4
    rows = (
        [("y", "y")] * 45 + [("n", "n")] * 25
        + [("y", "n")] * 5 + [("n", "y")] * 25
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = kappa_contingency(df, "a", "b").collect()[0]
    assert r.n == 100
    assert r.kappa_num == 2000 and r.kappa_den == 5000
    assert r.kappa_permille == 400


def test_kappa_below_chance_is_negative(spark):
    # total disagreement on a symmetric 2x2 -> kappa = -1
    df = spark.createDataFrame(
        [("y", "n")] * 5 + [("n", "y")] * 5, "a string, b string"
    )
    r = kappa_contingency(df, "a", "b").collect()[0]
    assert r.kappa_num == -r.kappa_den
    assert r.kappa_permille == -1000


def test_kappa_category_never_coassigned_still_in_e(spark):
    # category 'z' used by both raters but never on the same item:
    # its marginal product must still enter e.
    df = spark.createDataFrame(
        [("z", "y"), ("y", "z"), ("y", "y")], "a string, b string"
    )
    r = kappa_contingency(df, "a", "b").collect()[0]
    # n=3 diag=1; row: z1 y2; col: y2 z1; e = z:1*1 + y:2*2 = 5
    assert r.kappa_num == 3 * 1 - 5 == -2
    assert r.kappa_den == 9 - 5


# ----------------------------------------------------------- calibration


def test_calibration_bins_hand_checked(spark):
    # bin 0: scores {10, 30}, positives 1/2 -> pos 500, mean 20
    # bin 1: scores {110}, positive 1/1 -> pos 1000, mean 110
    df = spark.createDataFrame(
        [(10, True), (30, False), (110, True)], "s long, p boolean"
    )
    out = {
        r.bin: r
        for r in calibration_bins(
            df, F.col("s"), F.col("p"), bin_width=100
        ).collect()
    }
    assert out[0].n == 2 and out[0].n_pos == 1
    assert out[0].pos_permille == 500
    assert out[0].mean_score_permille == 20
    assert out[0].gap_permille == 480
    assert out[1].pos_permille == 1000 and out[1].gap_permille == 890


def test_calibration_bin_width_guard(spark):
    df = spark.createDataFrame([(1, True)], "s long, p boolean")
    with pytest.raises(ValueError, match="bin_width"):
        calibration_bins(df, F.col("s"), F.col("p"), bin_width=0)


# ----------------------------------------------------------- graph_coeff


def test_clustering_triangle_is_one(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "id_a long, id_b long"
    )
    for r in local_clustering(edges).collect():
        assert r.degree == 2 and r.n_triangles == 1
        assert r.coeff_num == 2 and r.coeff_den == 2
        assert r.coeff_permille == 1000


def test_clustering_path_and_hub(spark):
    # path 1-2-3 plus pendant 4 on 2: node 2 has d=3, no triangles
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "id_a long, id_b long"
    )
    out = {r.node: r for r in local_clustering(edges).collect()}
    assert out[2].degree == 3 and out[2].coeff_permille == 0
    assert out[2].coeff_den == 6
    # degree-1 nodes: den 0 renders permille 0, not a crash
    assert out[1].degree == 1 and out[1].coeff_permille == 0
    assert out[1].coeff_den == 0


def test_clustering_paw_graph(spark):
    # triangle 1-2-3 with pendant 4 on 1: c(1) = 2*1/(3*2) = 1/3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    out = {r.node: r for r in local_clustering(edges).collect()}
    assert out[1].coeff_num == 2 and out[1].coeff_den == 6
    assert out[1].coeff_permille == 333
    assert out[2].coeff_permille == 1000


# ------------------------------------------------------------------- psi


def test_psi_identical_distributions_zero(spark):
    ref = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 2, "c string"
    )
    cmp_w = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 1, "c string"
    )
    out = psi_terms(ref, cmp_w, "c").collect()
    assert all(abs(r.psi_term) < 1e-12 for r in out)


def test_psi_hand_computed_and_missing_category(spark):
    # ref: a 3/4, b 1/4; cmp: a 1/2, b absent, c 1/2
    ref = spark.createDataFrame([("a",)] * 3 + [("b",)], "c string")
    cmp_w = spark.createDataFrame([("a",), ("c",)], "c string")
    out = {r.cat: r for r in psi_terms(ref, cmp_w, "c").collect()}
    a = out["a"]
    assert a.c_ref == 3 and a.c_cmp == 1
    assert a.n_ref == 4 and a.n_cmp == 2
    assert a.psi_term == pytest.approx(
        (0.75 - 0.5) * math.log(0.75 / 0.5), abs=1e-12
    )
    # one-sided categories surface with NULL terms, counts intact
    assert out["b"].psi_term is None and out["b"].c_cmp == 0
    assert out["c"].psi_term is None and out["c"].c_ref == 0


# ----------------------------------------------------- x116 ann recall


def test_ann_recall_certificate_invariants(spark):
    from m5_competition_kaggle_spark.queries.extensions_r8b import (
        x116_ann_recall,
    )

    rows = x116_ann_recall(spark, "/root/testdata/sf0.001").collect()
    assert rows, "certificate produced no rows"
    assert {r.method for r in rows} == {"ivf", "lsh"}
    per_method = Counter(r.method for r in rows)
    assert per_method["ivf"] == per_method["lsh"]
    for r in rows:
        assert 0 <= r.n_hit <= r.n_exact
        assert r.recall_permille == (1000 * r.n_hit) // r.n_exact
        assert 0 <= r.recall_permille <= 1000


def test_ivf_full_probe_recall_is_exact(spark):
    """nprobe == n_centroids probes every inverted list, so IVF's
    candidate set is the whole corpus and top-k must equal the exact
    block-matmul baseline row-for-row."""
    from m5_competition_kaggle_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qset = emb.filter(F.col("vec_id") % 100 == 7)
    cols = ["query_id", "neighbor_id"]
    exact = {tuple(r) for r in
             brute_force_topk(emb, qset, k=5).select(*cols).collect()}
    full = {tuple(r) for r in
            ivf_topk(emb, qset, k=5, nprobe=8, n_centroids=8)
            .select(*cols).collect()}
    assert full == exact
