"""Unit tests for the round-8-queue third batch (KS drift, Benford,
largest-remainder apportionment) on tiny hand-checked inputs — the
oracle harness certifies the registered queries end-to-end; these pin
the operator semantics the fixtures don't isolate."""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.apportion import (
    largest_remainder,
)
from m5_competition_kaggle_spark.operators.benford import (
    BENFORD_PERMILLE,
    benford_profile,
)
from m5_competition_kaggle_spark.operators.ksdist import ks_statistic


# --------------------------------------------------------------- ks


def _frame(spark, rows):
    return spark.createDataFrame(rows, "g string, q long")


def test_ks_identical_distributions_zero(spark):
    rows = [("a", 1), ("a", 2), ("a", 3)]
    out = ks_statistic(
        _frame(spark, rows), _frame(spark, rows), "g", "q"
    ).collect()
    assert len(out) == 1
    assert out[0].d_num == 0 and out[0].ks_permille == 0


def test_ks_disjoint_supports_is_one(spark):
    ref = _frame(spark, [("a", 1), ("a", 2)])
    cmp_w = _frame(spark, [("a", 10), ("a", 11), ("a", 12)])
    out = ks_statistic(ref, cmp_w, "g", "q").collect()[0]
    # all ref mass is below all cmp mass: D = 1 at q = 2
    assert out.d_num == out.d_den == 6
    assert out.q_at == 2 and out.ks_permille == 1000


def test_ks_hand_computed_and_argmax_tiebreak(spark):
    # ref {1,2}, cmp {2,3}: ECDF gaps at q=1: |2*1-2*0|=2,
    # q=2: |2*2-2*1|=2, q=3: 0 -> max 2 at smallest q=1
    ref = _frame(spark, [("a", 1), ("a", 2)])
    cmp_w = _frame(spark, [("a", 2), ("a", 3)])
    out = ks_statistic(ref, cmp_w, "g", "q").collect()[0]
    assert out.d_num == 2 and out.d_den == 4
    assert out.q_at == 1 and out.ks_permille == 500


def test_ks_one_sided_group_dropped(spark):
    ref = _frame(spark, [("a", 1), ("b", 5)])
    cmp_w = _frame(spark, [("a", 1)])
    out = ks_statistic(ref, cmp_w, "g", "q").collect()
    assert [r.g for r in out] == ["a"]


# ----------------------------------------------------------- benford


def test_benford_hand_profile(spark):
    # digits: 1 x3 (1, 12, 199), 9 x1 (9000); zero/negative dropped
    df = spark.createDataFrame(
        [(1,), (12,), (199,), (9000,), (0,), (-5,)], "amt long"
    )
    out = {r.digit: r for r in benford_profile(df, "amt").collect()}
    assert set(out) == {1, 9}
    assert out[1].n == 3 and out[1].n_total == 4
    assert out[1].obs_permille == 750
    assert out[1].exp_permille == 301
    assert out[1].dev_permille == 449
    assert out[9].obs_permille == 250
    assert out[9].exp_permille == 45


def test_benford_constants_match_log10():
    import math

    for d, v in enumerate(BENFORD_PERMILLE, start=1):
        assert v == int(1000 * math.log10(1 + 1 / d))


def test_benford_grouped_totals_are_per_group(spark):
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 3)], "g string, amt long"
    )
    out = benford_profile(df, "amt", ["g"]).collect()
    totals = {(r.g, r.digit): r.n_total for r in out}
    assert totals[("x", 1)] == 2 and totals[("y", 3)] == 1


# -------------------------------------------------------- apportion


def test_largest_remainder_sums_to_budget_and_quota(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 3)], "k string, w long"
    )
    out = largest_remainder(df, "k", "w", 10).collect()
    shares = {r.k: r.share for r in out}
    assert sum(shares.values()) == 10
    # quota: floor(ideal) <= share <= ceil(ideal)
    for r in out:
        ideal_num = 10 * r.weight  # / 11
        assert ideal_num // 11 <= r.share <= -(-ideal_num // 11)


def test_largest_remainder_tie_breaks_on_key(spark):
    # budget 1, equal weights: remainders tie, 'a' wins by key asc
    df = spark.createDataFrame(
        [("b", 1), ("a", 1)], "k string, w long"
    )
    out = {r.k: r.share for r in
           largest_remainder(df, "k", "w", 1).collect()}
    assert out == {"a": 1, "b": 0}


def test_largest_remainder_exact_division_no_extras(spark):
    df = spark.createDataFrame(
        [("a", 2), ("b", 2)], "k string, w long"
    )
    out = largest_remainder(df, "k", "w", 4).collect()
    assert all(r.extra == 0 for r in out)
    assert {r.k: r.share for r in out} == {"a": 2, "b": 2}


def test_largest_remainder_budget_guard(spark):
    df = spark.createDataFrame([("a", 1)], "k string, w long")
    with pytest.raises(ValueError, match="budget"):
        largest_remainder(df, "k", "w", -1)


@pytest.mark.parametrize("budget", [0, 1, 7, 100])
def test_largest_remainder_budget_sweep(spark, budget):
    df = spark.createDataFrame(
        [("a", 17), ("b", 1), ("c", 5), ("d", 0)],
        "k string, w long",
    )
    out = largest_remainder(df, "k", "w", budget).collect()
    assert sum(r.share for r in out) == budget
    assert all(r.share >= 0 for r in out)
    # zero-weight keys never receive an extra
    assert {r.share for r in out if r.k == "d"} == {0}


# ----------------------------------------------------------- welch


def _welch(spark, rows):
    from m5_competition_kaggle_spark.operators.abtest import (
        welch_readout,
    )

    df = spark.createDataFrame(rows, "g string, arm int, q long")
    return {r.g: r for r in
            welch_readout(df, "g", "arm", "q").collect()}


def test_welch_hand_computed(spark):
    # arm0 {0, 4}: m=2, v=8; arm1 {1, 3}: m=2, v=2
    # t2 = 0 / (8/2 + 2/2) = 0  -> equal means read as exactly 0
    out = _welch(spark, [("g", 0, 0), ("g", 0, 4),
                         ("g", 1, 1), ("g", 1, 3)])["g"]
    assert (out.n_a, out.n_b) == (2, 2)
    assert (out.sum_a, out.sum_b) == (4, 4)
    assert (out.ss_a, out.ss_b) == (16, 10)
    assert out.welch_t2 == 0.0


def test_welch_nonzero_effect(spark):
    # arm0 {0, 2}: m=1, v=2; arm1 {10, 12}: m=11, v=2
    # t2 = 100 / (2/2 + 2/2) = 50
    out = _welch(spark, [("g", 0, 0), ("g", 0, 2),
                         ("g", 1, 10), ("g", 1, 12)])["g"]
    assert out.welch_t2 == pytest.approx(50.0, abs=1e-12)


def test_welch_null_when_underpowered_or_degenerate(spark):
    # one-row arm -> NULL; both arms zero-variance -> den 0 -> NULL
    out = _welch(spark, [("u", 0, 1), ("u", 1, 2), ("u", 1, 4),
                         ("z", 0, 3), ("z", 0, 3),
                         ("z", 1, 7), ("z", 1, 7)])
    assert out["u"].welch_t2 is None
    assert out["z"].welch_t2 is None


def test_welch_ignores_other_arms(spark):
    out = _welch(spark, [("g", 0, 1), ("g", 0, 3),
                         ("g", 1, 1), ("g", 1, 3),
                         ("g", 2, 999), ("g", 7, 999)])["g"]
    assert out.n_a == 2 and out.n_b == 2
    assert out.sum_a == 4 and out.sum_b == 4


# ---------------------------------------------------- target encode


def test_loo_target_encode_hand_computed(spark):
    from m5_competition_kaggle_spark.operators.target_encode import (
        loo_target_encode,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 30), ("b", 5)],
        "cat string, y long",
    )
    out = {(r.cat, r.y): r for r in
           loo_target_encode(df, "cat", "y").collect()}
    r = out[("a", 10)]
    assert (r.loo_num, r.loo_den, r.loo_q) == (50, 2, 25)
    assert out[("a", 30)].loo_q == 15
    # singleton category: no peers, NULL encoding (never global mean)
    s = out[("b", 5)]
    assert s.loo_num is None and s.loo_den is None and s.loo_q is None
    assert s.cat_n == 1


def test_loo_target_encode_never_sees_own_label(spark):
    from m5_competition_kaggle_spark.operators.target_encode import (
        loo_target_encode,
    )

    # one outlier row: its own encoding must exclude the outlier
    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("a", 900)], "cat string, y long"
    )
    out = {r.y: r for r in
           loo_target_encode(df, "cat", "y").collect()}
    assert out[900].loo_q == 0      # mean of the two zeros
    assert out[0].loo_q == 450      # (0 + 900) / 2
