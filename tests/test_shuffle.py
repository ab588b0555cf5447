"""Deterministic seeded shuffle (operators/shuffle.py)."""

from m5_competition_kaggle_spark.operators.shuffle import seeded_shuffle
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_positions_are_a_permutation(spark):
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    rows = seeded_shuffle(docs, "doc_id", seed=42).collect()
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(1, n + 1))


def test_reproducible_and_seed_sensitive(spark):
    docs = load_table(spark, SF, "documents")
    a1 = sorted(map(tuple, seeded_shuffle(docs, "doc_id", 7).collect()))
    a2 = sorted(map(tuple, seeded_shuffle(docs, "doc_id", 7).collect()))
    b = sorted(map(tuple, seeded_shuffle(docs, "doc_id", 8).collect()))
    assert a1 == a2
    assert a1 != b  # a different seed is a different permutation
    # ... over the same key set
    assert [t[0] for t in a1] == [t[0] for t in b]
