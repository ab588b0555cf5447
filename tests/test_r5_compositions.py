"""Sanity tests for the r5 composition queries that are otherwise
covered only by their oracle twins (x54, x56, x61, x62) — pin the
semantic invariants, not just the hash."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries.extensions_r5 import (
    x54_exact_k_sample,
    x56_snapshot_diff,
    x61_chunk_dedup,
    x62_oov_rate,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_x54_exactly_k_per_group(spark):
    rows = x54_exact_k_sample(spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got: dict[str, list] = {}
    for r in rows:
        got.setdefault(r["source"], []).append(r["sample_rank"])
    assert set(got) == set(per_source)
    for src, ranks in got.items():
        k = min(5, per_source[src])
        assert sorted(ranks) == list(range(1, k + 1)), src


def test_x56_partitions_the_union(spark):
    rows = {r["status"]: r for r in x56_snapshot_diff(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    n_old = docs.filter(F.col("doc_id") % 10 != 0).count()
    n_new = docs.filter(F.col("doc_id") % 7 != 0).count()
    total = sum(r["n"] for r in rows.values())
    union = docs.filter(
        (F.col("doc_id") % 10 != 0) | (F.col("doc_id") % 7 != 0)
    ).count()
    assert total == union <= n
    assert rows["added"]["n"] == n_new - docs.filter(
        (F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 10 != 0)
    ).count()
    # removed docs exist (multiples of 7 that are not multiples of 10)
    assert rows["removed"]["n"] > 0
    # changed = present in both with a simulated edit (% 13)
    assert rows["changed"]["n"] > 0
    _ = n_old


def test_x61_canonical_is_first_occurrence(spark):
    rows = x61_chunk_dedup(spark, SF).collect()
    assert rows  # the fixture corpus has copy-paste chunks
    for r in rows:
        assert r["n_occurrences"] > 1
        assert 1 <= r["n_docs"] <= r["n_occurrences"]
        assert 0 <= r["canonical_idx"] < 1 << 20


def test_x62_rates_are_consistent(spark):
    rows = x62_oov_rate(spark, SF).collect()
    docs_n = load_table(spark, SF, "documents").count()
    assert len(rows) == docs_n
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_permille"] == r["n_oov"] * 1000 // r["n_tokens"]
    # top-16 vocab over a ~31-token fixture vocabulary → OOV exists
    assert any(r["n_oov"] > 0 for r in rows)
