"""Incremental near-dup detection (operators/dedup_incremental.py)."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.dedup import minhash_lsh_pairs
from m5_competition_kaggle_spark.operators.dedup_incremental import (
    incremental_near_dups,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_equivalent_to_restricted_full_self_join(spark):
    """The incremental result == the full self-join's verified pairs
    restricted to (new x corpus) ∪ (new x earlier-new) — the exactness
    claim the x60 oracle relies on."""
    docs = load_table(spark, SF, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    out = {
        r["doc_id"]: (r["is_dup"], r["matched_id"], r["match_type"])
        for r in incremental_near_dups(
            new, corpus, "doc_id", "text"
        ).collect()
    }
    full = minhash_lsh_pairs(docs, "doc_id", "text", 16, 4, 3, 0.8)
    expected: dict[int, int] = {}
    for r in full.select("id_a", "id_b").collect():
        for n, m in ((r["id_a"], r["id_b"]), (r["id_b"], r["id_a"])):
            if n % 5 != 0:
                continue
            if m % 5 != 0 or m < n:  # corpus match, or earlier in batch
                expected[n] = min(expected.get(n, m), m)
    assert {n for n, v in out.items() if v[0] == 1} == set(expected)
    for n, m in expected.items():
        assert out[n][1] == m
        assert out[n][2] == ("corpus" if m % 5 != 0 else "batch")
    assert all(
        v == (0, None, "none")
        for n, v in out.items()
        if n not in expected
    )


def test_batch_keep_first_direction(spark):
    """Within the batch only EARLIER ids are matched against: the
    earliest member of an all-new duplicate group is kept."""
    rows = [(i, "identical text " * 10) for i in (3, 7, 11)]
    new = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = spark.createDataFrame([], "doc_id long, text string")
    out = {
        r["doc_id"]: (r["is_dup"], r["matched_id"])
        for r in incremental_near_dups(
            new, corpus, "doc_id", "text"
        ).collect()
    }
    assert out[3] == (0, None)
    assert out[7] == (1, 3)
    assert out[11] == (1, 3)


def test_empty_corpus_and_empty_batch(spark):
    docs = load_table(spark, SF, "documents")
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = incremental_near_dups(empty, docs, "doc_id", "text")
    assert out.count() == 0
    only_batch = incremental_near_dups(
        docs.limit(5), empty, "doc_id", "text"
    )
    assert only_batch.count() == 5
