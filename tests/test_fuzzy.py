"""Fuzzy (edit-distance) self-join (operators/fuzzy.py)."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.fuzzy import fuzzy_self_join


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, s string")
    out = fuzzy_self_join(df, "id", "s", **kw)
    return {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}


def test_finds_near_strings_with_exact_distance(spark):
    got = _pairs(
        spark,
        [(1, "spark engine"), (2, "spark enginx"), (3, "sparc engine"),
         (4, "completely different")],
        max_dist=2,
    )
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 2
    assert not any(4 in p for p in got)


def test_threshold_excludes_far_pairs(spark):
    got = _pairs(spark, [(1, "abcdefgh"), (2, "abzzzzgh")], max_dist=2)
    assert got == {}  # distance 4 > 2 — shares grams but fails verify


def test_stop_gram_prune_drops_common_only_pairs(spark):
    """Two strings whose ONLY shared grams are ultra-common are not
    candidates (the documented recall trade) — simulate by max_df=1."""
    rows = [(i, f"the {i:04d}") for i in range(5)]
    # every pair shares only 'the'/'he ' grams, each with df=5 > 1
    got = _pairs(spark, rows, max_dist=10, max_df=1)
    assert got == {}


def test_short_and_empty_strings(spark):
    got = _pairs(spark, [(1, ""), (2, "ab"), (3, "abc")], max_dist=3)
    assert got == {}  # no grams below length q → no candidates
