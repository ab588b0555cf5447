"""Unit tests for the round-6 operator batch (stats_exact, scd,
cooccur, phash, asof_ext, rolling_distinct) on tiny hand-checked
inputs — the oracle-differential harness certifies the registered
queries end-to-end; these pin operator edge cases the fixtures don't
exercise."""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.asof_ext import (
    asof_join_forward,
)
from m5_competition_kaggle_spark.operators.cooccur import (
    basket_pair_lift,
    bigram_next_word,
    char_pair_counts,
)
from m5_competition_kaggle_spark.operators.phash import (
    ahash,
    phash_near_pairs,
)
from m5_competition_kaggle_spark.operators.rolling_distinct import (
    trailing_distinct_count,
)
from m5_competition_kaggle_spark.operators.scd import change_islands
from m5_competition_kaggle_spark.operators.stats_exact import (
    gini_by_rank,
    group_ols_sums,
    winsorized_sum,
)


# ----------------------------------------------------------- stats_exact


def test_group_ols_exact_line(spark):
    # y = 3x + 7 exactly: slope_num/slope_den must reduce to 3
    rows = [("g", x, 3 * x + 7) for x in range(5)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = group_ols_sums(df, "g", "x", "y").collect()[0]
    assert out.n == 5
    assert out.slope_num == 3 * out.slope_den
    assert out.slope_den > 0


def test_group_ols_constant_x_degenerate(spark):
    df = spark.createDataFrame(
        [("g", 4, 1), ("g", 4, 9)], "g string, x long, y long"
    )
    out = group_ols_sums(df, "g", "x", "y").collect()[0]
    assert out.slope_den == 0  # caller-visible degenerate marker


def test_gini_uniform_is_zero_and_extreme_is_high(spark):
    uniform = spark.createDataFrame(
        [("a", i, 5) for i in range(4)], "g string, tb long, v long"
    )
    out = gini_by_rank(uniform, "g", "v", "tb").collect()[0]
    assert out.gini_num == 0  # equal shares → Gini 0
    extreme = spark.createDataFrame(
        [("a", 1, 0), ("a", 2, 0), ("a", 3, 0), ("a", 4, 100)],
        "g string, tb long, v long",
    )
    out = gini_by_rank(extreme, "g", "v", "tb").collect()[0]
    # one holder of everything among k=4: G = (k-1)/k = 3/4
    assert out.gini_num * 4 == out.gini_den * 3


def test_winsorized_sum_clamps_tails(spark):
    # 10 values: cut = 1, clamp to 2nd smallest / 2nd largest
    vals = [1000, 2, 3, 4, 5, 6, 7, 8, 9, -50]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "g string, tb long, v long",
    )
    out = winsorized_sum(df, "g", "v", "tb", tail_denominator=10).collect()[0]
    assert (out.n, out.cut) == (10, 1)
    assert (out.lo_v, out.hi_v) == (2, 9)
    # -50 → 2, 1000 → 9; the rest unchanged
    assert out.wsum == sum([2, 2, 3, 4, 5, 6, 7, 8, 9, 9])


def test_winsorized_small_group_no_cut(spark):
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate([5, 1, 9])],
        "g string, tb long, v long",
    )
    out = winsorized_sum(df, "g", "v", "tb", tail_denominator=10).collect()[0]
    assert out.cut == 0 and out.wsum == 15


# ------------------------------------------------------------------- scd


def test_change_islands_compresses_runs(spark):
    rows = [
        (1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "a"),
        (2, 10, "z"),
    ]
    df = spark.createDataFrame(rows, "k long, t long, attr string")
    out = {
        (r.k, r.island): r
        for r in change_islands(df, "k", "t", "attr").collect()
    }
    assert len(out) == 4
    a1 = out[(1, 1)]
    assert (a1.attr, a1.n_rows, a1.valid_from, a1.valid_to) == ("a", 2, 10, 30)
    b = out[(1, 2)]
    assert (b.attr, b.valid_from, b.valid_to) == ("b", 30, 40)
    a2 = out[(1, 3)]
    assert (a2.attr, a2.valid_to) == ("a", None)  # open-ended
    assert out[(2, 1)].n_rows == 1


# --------------------------------------------------------------- cooccur


def test_basket_pair_lift_counts(spark):
    rows = [
        (1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"),
        (3, "x"),  # duplicate line: presence must dedupe
    ]
    df = spark.createDataFrame(rows, "b long, item string")
    out = {
        (r.item_a, r.item_b): r
        for r in basket_pair_lift(df, "b", "item", min_pair_count=2).collect()
    }
    assert list(out) == [("x", "y")]
    r = out[("x", "y")]
    assert (r.pair_cnt, r.cnt_a, r.cnt_b, r.n_baskets) == (2, 3, 2, 3)
    # lift = 2*3 / (3*2) = 1 exactly
    assert r.lift_num == r.lift_den


def test_char_pair_counts_weighted_by_occurrence(spark):
    df = spark.createDataFrame([("abab abab",), ("ab!",)], "text string")
    out = {r.pair: r.cnt for r in char_pair_counts(df, "text", 10).collect()}
    # "abab" ×2 occurrences → ab:2,ba:1 each; "ab" → ab:1
    assert out["ab"] == 5 and out["ba"] == 2


def test_bigram_next_word_argmax_and_ties(spark):
    df = spark.createDataFrame(
        [("a b",), ("a b",), ("a c",), ("b c",)], "text string"
    )
    rows = {r.w1: r for r in bigram_next_word(df, "text", 10).collect()}
    assert rows["a"].next_w == "b" and rows["a"].next_cnt == 2
    assert rows["a"].w1_cnt == 3
    assert rows["b"].next_w == "c"


# ----------------------------------------------------------------- phash


def test_phash_banding_finds_all_close_pairs(spark):
    # brute-force ground truth over a corpus with exact dup + noise
    texts = [f"doc number {i}" for i in range(40)] + ["doc number 0"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    hashes = {r.doc_id: r.phash for r in ahash(df, "doc_id", "text").collect()}
    expect = {
        (a, b)
        for a in hashes
        for b in hashes
        if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 2
    }
    got = {
        (r.id_a, r.id_b)
        for r in phash_near_pairs(df, "doc_id", "text", 2).collect()
    }
    assert got == expect
    assert (0, 40) in got  # the exact dup is hamming 0
    for r in phash_near_pairs(df, "doc_id", "text", 2).collect():
        assert bin(hashes[r.id_a] ^ hashes[r.id_b]).count("1") == r.hamming


def test_phash_partition_cols_restrict(spark):
    df = spark.createDataFrame(
        [(1, "same text", "s1"), (2, "same text", "s2"),
         (3, "same text", "s1")],
        "doc_id long, text string, src string",
    )
    got = {
        (r.id_a, r.id_b)
        for r in phash_near_pairs(
            df, "doc_id", "text", 2, partition_cols=("src",)
        ).collect()
    }
    assert got == {(1, 3)}  # cross-source pair excluded


# -------------------------------------------------------------- asof_ext


def test_asof_forward_inclusive_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 150), (3, 1, 300), (4, 2, 100)],
        "id long, k long, t long",
    )
    right = spark.createDataFrame(
        [(1, 150, 15), (1, 200, 20)], "k long, t long, v long"
    )
    out = {
        r.id: r
        for r in asof_join_forward(
            left, right, on=["k"], ts_col="t", value_cols=["v"],
            tolerance=60,
        ).collect()
    }
    assert (out[1].matched_ts, out[1].v) == (150, 15)  # within 60
    assert (out[2].matched_ts, out[2].v) == (150, 15)  # equal ts visible
    assert (out[3].matched_ts, out[3].v) == (None, None)  # nothing follows
    assert (out[4].matched_ts, out[4].v) == (None, None)  # other key
    # without tolerance, id 1 still matches the NEAREST (150, not 200)
    loose = {
        r.id: r
        for r in asof_join_forward(
            left, right, on=["k"], ts_col="t", value_cols=["v"]
        ).collect()
    }
    assert (loose[1].matched_ts, loose[1].v) == (150, 15)


def test_asof_forward_tolerance_nulls_far_matches(spark):
    left = spark.createDataFrame([(1, 1, 0)], "id long, k long, t long")
    right = spark.createDataFrame([(1, 500, 5)], "k long, t long, v long")
    out = asof_join_forward(
        left, right, on=["k"], ts_col="t", value_cols=["v"], tolerance=100
    ).collect()[0]
    assert out.matched_ts is None and out.v is None


# ------------------------------------------------------- rolling_distinct


def test_trailing_distinct_window(spark):
    rows = [
        (10, 1), (10, 2),          # day 10: {1,2}
        (12, 2), (12, 2),          # day 12: {2}
        (20, 3),                   # day 20: {3} — outside any 7-window of 10/12
    ]
    df = spark.createDataFrame(rows, "day long, u long")
    out = {
        r.period: r.uniq
        for r in trailing_distinct_count(df, "u", "day", 7).collect()
    }
    # only observed days are emitted
    assert set(out) == {10, 12, 20}
    assert out[10] == 2           # {1,2}
    assert out[12] == 2           # {1,2} from day 10 + {2}
    assert out[20] == 1           # day 12 is 8 days back — expired


# ------------------------------------------- ADVICE r6 regression fixes


def test_asof_forward_null_value_col_same_row(spark):
    """A NULL in one value column must NOT be backfilled from a LATER
    right row: all matched fields come from the matched_ts row."""
    left = spark.createDataFrame([(1, 1, 100)], "id long, k long, t long")
    right = spark.createDataFrame(
        [(1, 150, None, 7), (1, 200, 99, 8)],
        "k long, t long, a long, b long",
    )
    out = asof_join_forward(
        left, right, on=["k"], ts_col="t", value_cols=["a", "b"]
    ).collect()[0]
    assert out.matched_ts == 150
    assert out.a is None  # from the 150 row, not 99 from the 200 row
    assert out.b == 7


def test_change_islands_null_transitions(spark):
    """non-null -> NULL -> non-null must be three islands, and a NULL
    first row still opens island 1 (null-safe change flag)."""
    df = spark.createDataFrame(
        [("k", 1, "a"), ("k", 2, None), ("k", 3, None), ("k", 4, "a"),
         ("j", 1, None), ("j", 2, None)],
        "k string, t long, attr string",
    )
    out = {
        (r.k, r.island): (r.attr, r.n_rows, r.valid_from, r.valid_to)
        for r in change_islands(df, "k", "t", "attr").collect()
    }
    assert out[("k", 1)] == ("a", 1, 1, 2)
    assert out[("k", 2)] == (None, 2, 2, 4)  # NULL run is its own island
    assert out[("k", 3)] == ("a", 1, 4, None)
    assert out[("j", 1)] == (None, 2, 1, None)  # NULL-opening key


def test_winsorized_sum_rejects_overlapping_tails(spark):
    df = spark.createDataFrame(
        [("g", i, i) for i in range(4)], "g string, v long, tb long"
    )
    with pytest.raises(ValueError, match="tail_denominator"):
        winsorized_sum(df, "g", "v", "tb", tail_denominator=2)


def test_trailing_distinct_rejects_nonpositive_window(spark):
    df = spark.createDataFrame([(1, 1)], "u long, day long")
    with pytest.raises(ValueError, match="window_n"):
        trailing_distinct_count(df, "u", "day", 0)


def test_anomaly_kernel_rejects_quantization_overflow():
    import pandas as pd

    from m5_competition_kaggle_spark.streaming.anomaly_state import (
        _flags_kernel,
    )

    ok = _flags_kernel(pd.Series([1, 2, 3]), window=3, min_n=2, z=3,
                       prefix=[])
    assert len(ok) == 3
    big = 2**27  # window * big^2 = 3 * 2^54 > 2^53
    with pytest.raises(ValueError, match="quantization contract"):
        _flags_kernel(pd.Series([big, big]), window=3, min_n=2, z=3,
                      prefix=[])
