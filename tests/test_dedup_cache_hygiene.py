"""r12 persist-leak rework regression: the dedup family used to
.persist() its shingle/assignment intermediates and never unpersist —
one plan-keyed CacheManager entry leaked per CALL (invisible to GC, so
a long-lived session accumulated them without bound; same class as the
r10 prefix.py defect, fixed the same way). Every operator below must
leave the CacheManager empty after each call while producing identical
results across repeated invocations — the localCheckpoint blocks
themselves are ContextCleaner-managed, not plan-keyed."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.dedup import (
    containment_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from m5_competition_kaggle_spark.operators.dedup_incremental import (
    incremental_near_dups,
)
from m5_competition_kaggle_spark.operators.semantic_dedup import (
    semantic_dedup,
)


def _docs(spark, n=30):
    base = (
        "the quick brown fox jumps over the lazy dog and then "
        "runs far away into the deep dark wood tonight"
    )
    rows = [
        # pairs of near-identical docs (i, i+1) plus unique tails
        (i, base + (f" extra{i // 2}" * 3) + (" tail" if i % 2 else ""))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _assert_stable_and_clean(spark, build, key):
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()
    expected = None
    for _ in range(3):
        got = sorted(key(r) for r in build().collect())
        expected = expected if expected is not None else got
        assert got == expected
        assert cm.isEmpty(), "operator leaked a CacheManager entry"


def test_minhash_lsh_pairs_cache_clean(spark):
    docs = _docs(spark)
    _assert_stable_and_clean(
        spark,
        lambda: minhash_lsh_pairs(docs, "doc_id", "text"),
        lambda r: (r.id_a, r.id_b),
    )


def test_ngram_jaccard_pairs_cache_clean(spark):
    docs = _docs(spark)
    _assert_stable_and_clean(
        spark,
        lambda: ngram_jaccard_pairs(docs, "doc_id", "text"),
        lambda r: (r.id_a, r.id_b, r.n_common),
    )


def test_containment_pairs_cache_clean(spark):
    docs = _docs(spark)
    _assert_stable_and_clean(
        spark,
        lambda: containment_pairs(docs, "doc_id", "text"),
        lambda r: (r.id_a, r.id_b),
    )


def test_incremental_near_dups_cache_clean(spark):
    docs = _docs(spark, 20)
    corpus = docs.filter(F.col("doc_id") < 10)
    new = docs.filter(F.col("doc_id") >= 10)
    _assert_stable_and_clean(
        spark,
        lambda: incremental_near_dups(new, corpus, "doc_id", "text"),
        lambda r: (r.doc_id, r.is_dup, r.matched_id, r.match_type),
    )


def test_semantic_dedup_cache_clean(spark):
    vecs = spark.createDataFrame(
        [
            (i, [float((i % 5) + 1), float((i % 3) - 1), 0.5])
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    )
    _assert_stable_and_clean(
        spark,
        lambda: semantic_dedup(vecs, threshold_dot=0, n_centroids=4),
        lambda r: (r.vec_id, r.keep, r.canonical_id),
    )
