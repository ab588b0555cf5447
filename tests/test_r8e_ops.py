"""Unit tests for the r8e diagnostics: ESS, conformal threshold,
split balance, Poisson bootstrap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- ess


def test_ess_equal_weights_is_n(spark):
    from m5_competition_kaggle_spark.operators.ess import (
        ess_by_group,
    )

    df = spark.createDataFrame(
        [("g", 5)] * 4, "grp string, w long"
    )
    r = ess_by_group(df, ["grp"], "w").collect()[0]
    # equal weights: ESS = n exactly -> 1000 permille
    assert (r.n, r.sum_w, r.sum_w2) == (4, 20, 100)
    assert r.ess_permille == 1000


def test_ess_dominant_weight_collapses(spark):
    from m5_competition_kaggle_spark.operators.ess import (
        ess_by_group,
    )

    df = spark.createDataFrame(
        [("g", 1000), ("g", 1), ("g", 1), ("g", 1)],
        "grp string, w long",
    )
    r = ess_by_group(df, ["grp"], "w").collect()[0]
    # ESS = 1003^2/1000003 ~= 1.006 of 4 -> 251 permille
    assert r.ess_num == 1003 * 1003 and r.ess_den == 1_000_003
    assert r.ess_permille == (1000 * 1003 * 1003) // (1_000_003 * 4)


# ------------------------------------------------------- conformal


def _conformal(spark, scores, an, ad):
    from m5_competition_kaggle_spark.operators.conformal import (
        conformal_threshold,
    )

    df = spark.createDataFrame(
        [("g", s) for s in scores], "grp string, s long"
    )
    return conformal_threshold(df, ["grp"], "s", an, ad).collect()[0]


def test_conformal_finite_sample_rank(spark):
    # n=9, alpha=1/10: k = ceil(10*0.9) = 9 -> max score
    r = _conformal(spark, list(range(1, 10)), 1, 10)
    assert (r.n, r.k, r.q_hat) == (9, 9, 9)
    assert (r.cov_count, r.cov_permille) == (9, 1000)


def test_conformal_mid_rank_and_coverage(spark):
    # n=4, alpha=1/2: k = ceil(5*0.5) = 3 -> third smallest
    r = _conformal(spark, [10, 20, 30, 40], 1, 2)
    assert (r.k, r.q_hat) == (3, 30)
    assert (r.cov_count, r.cov_permille) == (3, 750)


def test_conformal_k_exceeds_n_is_null(spark):
    # n=3, alpha=1/10: k = ceil(4*0.9) = 4 > n -> no finite bound
    r = _conformal(spark, [1, 2, 3], 1, 10)
    assert r.k == 4 and r.q_hat is None
    assert r.cov_count is None and r.cov_permille is None


def test_conformal_alpha_validation(spark):
    from m5_competition_kaggle_spark.operators.conformal import (
        conformal_threshold,
    )

    with pytest.raises(ValueError):
        conformal_threshold(None, ["g"], "s", 0, 10)
    with pytest.raises(ValueError):
        conformal_threshold(None, ["g"], "s", 10, 10)


# --------------------------------------------------------- balance


def test_split_balance_perfect_split_zero_chi2(spark):
    from m5_competition_kaggle_spark.operators.balance import (
        split_balance,
    )

    rows = [("a", i) for i in range(10)] + [
        ("b", i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "lang string, i long")
    out = {
        r.lang: r
        for r in split_balance(
            df, ["lang"], F.col("i") < 8
        ).collect()
    }
    for r in out.values():
        assert (r.n_train, r.n_test) == (8, 2)
        assert r.train_permille == 800
        assert r.global_train_permille == 800
        assert r.chi2 == 0.0


def test_split_balance_skewed_stratum(spark):
    from m5_competition_kaggle_spark.operators.balance import (
        split_balance,
    )

    # stratum a: 4 train 0 test; stratum b: 0 train 4 test
    rows = [("a", True)] * 4 + [("b", False)] * 4
    df = spark.createDataFrame(rows, "lang string, tr boolean")
    out = {
        r.lang: r
        for r in split_balance(df, ["lang"], F.col("tr")).collect()
    }
    # E(train|a) = 4*4/8 = 2; chi2_a = (4-2)^2/2 + (0-2)^2/2 = 4
    assert out["a"].chi2 == pytest.approx(4.0)
    assert out["b"].chi2 == pytest.approx(4.0)
    assert out["a"].train_permille == 1000
    assert out["b"].train_permille == 0


# ------------------------------------------------------- bootstrap


def test_poisson_weight_thresholds(spark):
    from m5_competition_kaggle_spark.operators.bootstrap import (
        poisson_weight,
    )

    df = spark.range(1000).select(
        F.col("id"), poisson_weight(F.col("id")).alias("w")
    )
    hist = {
        r.w: r["count"]
        for r in df.groupBy("w").count().collect()
    }
    # exactly the permille-quantized Poisson(1) pmf
    assert hist == {0: 368, 1: 368, 2: 184, 3: 61, 4: 15, 5: 3,
                    6: 1}


def test_bootstrap_ci_brackets_point_and_is_deterministic(spark):
    from m5_competition_kaggle_spark.operators.bootstrap import (
        poisson_bootstrap_ci,
    )

    rows = [("g", i, 1000 + (i * 37) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    out1 = poisson_bootstrap_ci(
        df, ["grp"], "v", "id", b=16, lo_rank=2, hi_rank=15
    ).collect()[0]
    out2 = poisson_bootstrap_ci(
        df, ["grp"], "v", "id", b=16, lo_rank=2, hi_rank=15
    ).collect()[0]
    assert out1 == out2  # derandomized: bit-identical reruns
    assert out1.n == 200 and out1.n_reps == 16
    assert out1.ci_lo_q <= out1.point_q <= out1.ci_hi_q
    # interval is tight for a 200-row mean of range-100 values
    assert out1.ci_hi_q - out1.ci_lo_q < 20


def test_bootstrap_rank_validation(spark):
    from m5_competition_kaggle_spark.operators.bootstrap import (
        poisson_bootstrap_ci,
    )

    with pytest.raises(ValueError):
        poisson_bootstrap_ci(
            None, ["g"], "v", "id", b=8, lo_rank=2, hi_rank=9
        )


def test_bootstrap_xx64_fast_path_statistically_equivalent(spark):
    from m5_competition_kaggle_spark.operators.bootstrap import (
        poisson_bootstrap_ci,
    )

    rows = [("g", i, 1000 + (i * 37) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    fast1 = poisson_bootstrap_ci(
        df, ["grp"], "v", "id", hash_fn="xx64"
    ).collect()[0]
    fast2 = poisson_bootstrap_ci(
        df, ["grp"], "v", "id", hash_fn="xx64"
    ).collect()[0]
    slow = poisson_bootstrap_ci(
        df, ["grp"], "v", "id", hash_fn="h64"
    ).collect()[0]
    assert fast1 == fast2                       # still derandomized
    assert fast1.point_q == slow.point_q        # same point estimate
    assert fast1.ci_lo_q <= fast1.point_q <= fast1.ci_hi_q
    # same statistical construction -> comparable interval widths
    wf = fast1.ci_hi_q - fast1.ci_lo_q
    ws = slow.ci_hi_q - slow.ci_lo_q
    assert 0 < wf < 5 * ws and 0 < ws < 5 * wf

    import pytest as _pytest

    with _pytest.raises(ValueError):
        poisson_bootstrap_ci(
            df, ["grp"], "v", "id", hash_fn="sha9"
        )
