"""Edge-contract tests for the r8 operator batch — the degenerate
inputs the sf fixtures never produce: NULL categories through outer
joins, NULL scores in rankings, zero denominators under ANSI mode,
sign-violating weights. Each test pins a guard added after an
adversarial self-review; the certified fixture outputs are unchanged
by every one of these guards (verified by the oracle sweep)."""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.agreement import (
    kappa_contingency,
)
from m5_competition_kaggle_spark.operators.apportion import (
    largest_remainder,
)
from m5_competition_kaggle_spark.operators.balance import split_balance
from m5_competition_kaggle_spark.operators.gains import lift_table
from m5_competition_kaggle_spark.operators.ksdist import ks_statistic
from m5_competition_kaggle_spark.operators.psi import psi_from_counts
from m5_competition_kaggle_spark.operators.weighted_quantile import (
    weighted_quantiles,
)


# ------------------------------------------------------------------ psi


def test_psi_null_category_matches_itself(spark):
    # a NULL category present in BOTH windows must join into ONE row
    # (c_ref=3, c_cmp=5), not split into two half-rows that distort
    # the totals
    rc = spark.createDataFrame(
        [(None, 3), ("x", 7)], "cat string, c_ref long"
    )
    cc = spark.createDataFrame(
        [(None, 5), ("x", 5)], "cat string, c_cmp long"
    )
    rows = {r["cat"]: r for r in psi_from_counts(rc, cc).collect()}
    assert len(rows) == 2
    assert (rows[None]["c_ref"], rows[None]["c_cmp"]) == (3, 5)
    assert rows[None]["n_ref"] == 10 and rows[None]["n_cmp"] == 10
    assert rows[None]["psi_term"] is not None


def test_psi_one_sided_category_still_surfaces(spark):
    rc = spark.createDataFrame([("a", 4)], "cat string, c_ref long")
    cc = spark.createDataFrame([("b", 4)], "cat string, c_cmp long")
    rows = {r["cat"]: r for r in psi_from_counts(rc, cc).collect()}
    assert rows["a"]["c_cmp"] == 0 and rows["a"]["psi_term"] is None
    assert rows["b"]["c_ref"] == 0 and rows["b"]["psi_term"] is None


# --------------------------------------------------------------- ksdist


def test_ks_null_values_are_dropped_from_the_ecdf(spark):
    # identical distributions plus a NULL-value row on one side:
    # KS must be 0 (NULLs dropped), not shifted by a phantom cell
    ref = spark.createDataFrame(
        [("g", 1), ("g", 2)], "grp string, q long"
    )
    cmp_w = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", None)], "grp string, q long"
    )
    r = ks_statistic(ref, cmp_w, "grp", "q").collect()
    assert len(r) == 1
    assert r[0]["d_num"] == 0 and r[0]["n_cmp"] == 2


# ------------------------------------------------------------ agreement


def test_kappa_single_category_is_null_not_div0(spark):
    # both raters always say "good": e = n*n, kappa_den = 0, kappa is
    # 0/0 — must surface as NULL, not an ANSI DIVIDE_BY_ZERO crash
    df = spark.createDataFrame(
        [("good", "good")] * 4, "a string, b string"
    )
    r = kappa_contingency(df, "a", "b").collect()
    assert len(r) == 1
    assert r[0]["kappa_den"] == 0
    assert r[0]["kappa_permille"] is None


# ------------------------------------------------------------ apportion


def test_apportion_negative_weight_raises(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", -2)], "k string, w long"
    )
    with pytest.raises(Exception, match="non-negative"):
        largest_remainder(df, "k", "w", 10).collect()


def test_apportion_zero_total_raises_with_contract(spark):
    df = spark.createDataFrame(
        [("a", 0), ("b", 0)], "k string, w long"
    )
    with pytest.raises(Exception, match="positive total"):
        largest_remainder(df, "k", "w", 10).collect()


def test_apportion_zero_weight_key_gets_zero_share(spark):
    df = spark.createDataFrame(
        [("a", 3), ("b", 0)], "k string, w long"
    )
    rows = {r["k"]: r for r in
            largest_remainder(df, "k", "w", 7).collect()}
    assert rows["b"]["share"] == 0 and rows["a"]["share"] == 7


# ---------------------------------------------------------------- gains


def test_lift_table_null_scores_are_excluded(spark):
    # the NULL-scored positive must NOT take rank 1 (negated sort
    # would put it there); it is excluded entirely
    df = spark.createDataFrame(
        [(1, 10, 0), (2, 5, 1), (3, None, 1)],
        "id long, score long, positive int",
    )
    rows = lift_table(df, "score", "positive", "id", 2).collect()
    assert sum(r["n"] for r in rows) == 2
    by_bucket = {r["bucket"]: r for r in rows}
    assert by_bucket[1]["pos"] == 0  # score 10, a negative, ranks 1st
    assert by_bucket[2]["cum_pos"] == 1


# ---------------------------------------------------- weighted_quantile


def test_weighted_quantiles_rejects_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [("g", 1, 2), ("g", 2, 0)], "grp string, v long, w long"
    )
    with pytest.raises(Exception, match="positive weights"):
        weighted_quantiles(df, ["grp"], "v", "w").collect()


def test_weighted_quantiles_median_on_mass(spark):
    # value 1 carries 1 of 4 mass units, value 9 carries 3: the
    # weighted median is 9 (cum 4/4 >= 1/2 first at... cum(1)=1 <2,
    # cum(9)=4 >= 2), the p25 is 1 (cum 1 >= 1)
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 9, 3)], "grp string, v long, w long"
    )
    r = weighted_quantiles(df, ["grp"], "v", "w").collect()[0]
    assert r["wq_1_4"] == 1 and r["wq_1_2"] == 9 and r["wq_3_4"] == 9


# -------------------------------------------------------------- balance


def test_split_balance_null_flag_excluded_from_both_sides(spark):
    df = spark.createDataFrame(
        [("en", True), ("en", False), ("en", None)],
        "lang string, is_train boolean",
    )
    r = split_balance(df, ["lang"], F.col("is_train")).collect()[0]
    assert (r["n_train"], r["n_test"], r["n_row"]) == (1, 1, 2)


# ------------------------------------------------- window-frame shape


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_interpolate_has_no_unbounded_following_frame(spark):
    # an unbounded-FOLLOWING frame is re-evaluated from scratch per
    # row by WindowExec (measured O(n²): 53 s vs 0.5 s on one
    # 60k-row series) — the lookahead must run as the REVERSED
    # growing frame instead
    from m5_competition_kaggle_spark.operators.interpolate import (
        linear_interpolate,
    )

    df = spark.createDataFrame(
        [("g", 1, 10, False), ("g", 2, None, True), ("g", 3, 30, False)],
        "grp string, t long, y long, masked boolean",
    )
    out = linear_interpolate(df, ["grp"], "t", "y", "masked")
    assert "UNBOUNDED FOLLOWING" not in _optimized_plan(out).upper()
    r = {x["t"]: x for x in out.collect()}
    assert r[2]["interp_q"] == 20


def test_asof_forward_has_no_unbounded_following_frame(spark):
    from m5_competition_kaggle_spark.operators.asof_ext import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [("k", 5)], "key string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 5, 100), ("k", 9, 200)], "key string, ts long, v long"
    )
    out = asof_join_forward(left, right, ["key"], "ts", ["v"])
    assert "UNBOUNDED FOLLOWING" not in _optimized_plan(out).upper()
    r = out.collect()[0]
    assert (r["matched_ts"], r["v"]) == (5, 100)


# ---------------------------------------------------------------- merge


def test_merge_rejects_unknown_op(spark):
    from m5_competition_kaggle_spark.operators.merge import merge_upsert

    snap = spark.createDataFrame([(1, 10)], "k long, v long")
    bad = spark.createDataFrame([(2, "X", 20)], "k long, op string, v long")
    with pytest.raises(Exception, match="op must be"):
        merge_upsert(snap, bad, "k", ["v"]).collect()


def test_merge_rejects_null_op(spark):
    from m5_competition_kaggle_spark.operators.merge import merge_upsert

    snap = spark.createDataFrame([(1, 10)], "k long, v long")
    bad = spark.createDataFrame([(2, None, 20)], "k long, op string, v long")
    with pytest.raises(Exception, match="op must be"):
        merge_upsert(snap, bad, "k", ["v"]).collect()
