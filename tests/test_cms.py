"""Count-Min Sketch (operators/cms.py) — overestimate guarantee and
the merge-monoid property that makes it shuffle-order-independent.
"""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.text import tokens
from m5_competition_kaggle_spark.operators.cms import (
    CMS_D,
    CMS_W,
    cms_build,
    cms_estimate,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _tokens(spark):
    docs = load_table(spark, SF, "documents")
    return docs.select(
        F.col("doc_id"),
        F.explode(
            F.filter(tokens(F.lower(F.col("text"))), lambda t: t != F.lit(""))
        ).alias("token"),
    )


def test_estimates_never_underestimate(spark):
    toks = _tokens(spark).select("token")
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    sketch = cms_build(toks, "token")
    est = cms_estimate(sketch, exact.select("token"), "token")
    joined = exact.join(est, "token").collect()
    assert len(joined) > 10  # fixture vocab is small (~31 tokens)
    assert all(r["est_cnt"] >= r["exact"] for r in joined)
    # the sketch must be useful, not saturated: heavy tokens close
    heavy = [r for r in joined if r["exact"] >= 50]
    assert heavy and all(
        r["est_cnt"] <= r["exact"] * 3 for r in heavy
    ), sorted((r["exact"], r["est_cnt"]) for r in heavy)[-3:]


def test_sketch_state_is_bounded(spark):
    toks = _tokens(spark).select("token")
    assert cms_build(toks, "token").count() <= CMS_D * CMS_W


def test_merge_is_cellwise_sum(spark):
    """sketch(A ⊎ B) == cellwise sum of sketch(A) + sketch(B): the
    monoid property that makes partial aggregation and any merge tree
    give identical cells."""
    toks = _tokens(spark)
    a = toks.filter(F.col("doc_id") % 2 == 0).select("token")
    b = toks.filter(F.col("doc_id") % 2 == 1).select("token")
    whole = cms_build(toks.select("token"), "token")
    merged = (
        cms_build(a, "token")
        .unionByName(cms_build(b, "token"))
        .groupBy("d", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_grouped_sketch(spark):
    docs = load_table(spark, SF, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.filter(tokens(F.lower(F.col("text"))), lambda t: t != F.lit(""))
        ).alias("token"),
    )
    sk = cms_build(toks, "token", ("source",))
    n_groups = sk.select("source").distinct().count()
    assert n_groups == docs.select("source").distinct().count()
    assert sk.count() <= n_groups * CMS_D * CMS_W


def test_weighted_build_equals_occurrence_build(spark):
    """cms_build over a pre-aggregated (item, count) table with
    weight_col must be cell-for-cell identical to the per-occurrence
    build — the equivalence the x70 single-pass plan rests on."""
    toks = _tokens(spark).select("token")
    occ = cms_build(toks, "token").collect()
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    wtd = cms_build(tf, "token", weight_col="cnt").collect()
    assert sorted((r["d"], r["pos"], r["cnt"]) for r in occ) == sorted(
        (r["d"], r["pos"], r["cnt"]) for r in wtd
    )
