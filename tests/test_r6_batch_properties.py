"""Property tests for the round-6 operator batches: randomized inputs
checked against brute-force Python references. Complements the
oracle-differential certification (fixed fixtures) with adversarial
shapes: ties, empty groups, negative values, degenerate windows."""

import random

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.asof_ext import (
    asof_join_forward,
)
from m5_competition_kaggle_spark.operators.robust import mad_outlier_stats
from m5_competition_kaggle_spark.operators.rolling_distinct import (
    trailing_distinct_count,
)
from m5_competition_kaggle_spark.operators.stats_exact import (
    winsorized_sum,
)


def test_asof_forward_matches_bruteforce_random(spark):
    rnd = random.Random(7)
    left = [(i, rnd.randint(1, 3), rnd.randint(0, 100))
            for i in range(60)]
    right_raw = {(rnd.randint(1, 3), rnd.randint(0, 100))
                 for _ in range(40)}
    right = [(k, t, k * 1000 + t) for (k, t) in right_raw]
    ldf = spark.createDataFrame(left, "id long, k long, t long")
    rdf = spark.createDataFrame(right, "k long, t long, v long")
    tol = 15
    got = {
        r.id: (r.matched_ts, r.v)
        for r in asof_join_forward(
            ldf, rdf, on=["k"], ts_col="t", value_cols=["v"],
            tolerance=tol,
        ).collect()
    }
    for (i, k, t) in left:
        following = sorted(
            (rt, rv) for (rk, rt, rv) in right if rk == k and rt >= t
        )
        expect = None
        if following and following[0][0] <= t + tol:
            expect = following[0]
        assert got[i] == (expect or (None, None)), (i, k, t)


def test_winsorized_matches_python_reference_random(spark):
    rnd = random.Random(11)
    for trial in range(3):
        vals = [rnd.randint(-50, 50) for _ in range(rnd.randint(1, 40))]
        df = spark.createDataFrame(
            [("g", i, v) for i, v in enumerate(vals)],
            "g string, tb long, v long",
        )
        out = winsorized_sum(df, "g", "v", "tb", 10).collect()[0]
        s = sorted(vals)
        cut = len(s) // 10
        lo, hi = s[cut], s[len(s) - cut - 1]
        ref = sum(min(max(v, lo), hi) for v in s)
        assert out.wsum == ref and out.cut == cut, (trial, vals)


def test_mad_matches_python_reference_random(spark):
    rnd = random.Random(13)
    for trial in range(3):
        vals = [rnd.randint(-100, 100) for _ in range(rnd.randint(1, 30))]
        df = spark.createDataFrame(
            [("g", i, v) for i, v in enumerate(vals)],
            "g string, tb long, v long",
        )
        out = mad_outlier_stats(df, "g", "v", "tb", c=3).collect()[0]
        s = sorted(vals)
        med = s[(len(s) + 1) // 2 - 1]  # lower median, 1-based rank
        d = sorted(abs(v - med) for v in vals)
        mad = d[(len(d) + 1) // 2 - 1]
        n_out = sum(1 for v in vals if abs(v - med) > 3 * mad)
        assert (out.med, out.mad, out.n_outliers) == (med, mad, n_out), (
            trial, vals,
        )


def test_trailing_distinct_matches_bruteforce_random(spark):
    rnd = random.Random(17)
    obs = [(rnd.randint(1, 8), rnd.randint(0, 20)) for _ in range(80)]
    df = spark.createDataFrame(obs, "u long, day long")
    got = {
        r.period: r.uniq
        for r in trailing_distinct_count(df, "u", "day", 7).collect()
    }
    days = sorted({d for (_, d) in obs})
    for day in days:
        expect = len({u for (u, d) in obs if day - 6 <= d <= day})
        assert got[day] == expect, day
    assert set(got) == set(days)


def test_phash_pairs_complete_under_banding_random(spark):
    # random texts: banding must find EXACTLY the brute-force pairs
    from m5_competition_kaggle_spark.operators.phash import (
        ahash,
        phash_near_pairs,
    )

    rnd = random.Random(23)
    texts = ["w" + str(rnd.randint(0, 200)) for _ in range(120)]
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
