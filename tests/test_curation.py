"""Semantic unit tests for the curation operators (chunking,
decontamination, stratified sampling, repetition metrics, IVF ANN) —
planted inputs with hand-computed expectations; the cross-engine value
contract is separately pinned by the DuckDB oracles
(scripts/check_oracle.py, x19–x23)."""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.curation import (
    chunk_documents,
    contamination_hits,
    repetition_features,
    stratified_keep,
)
from m5_competition_kaggle_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_chunk_documents_boundaries(spark):
    # 10 tokens, size 4, stride 3 → starts 0,3,6,9; last chunk 1 token
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        chunk_documents(df, "doc_id", "text", chunk_size=4, stride=3)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [(r["chunk_idx"], r["chunk_start"], r["n_chunk_tokens"])
            for r in rows] == [(0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)]
    # full-chunk hashes differ, and a doc shorter than one chunk → 1 chunk
    assert len({r["chunk_hash"] for r in rows}) == 4
    short = chunk_documents(
        spark.createDataFrame([(2, "a b")], "doc_id long, text string"),
        "doc_id", "text", chunk_size=4, stride=3,
    ).collect()
    assert len(short) == 1 and short[0]["n_chunk_tokens"] == 2


def test_contamination_planted(spark):
    # doc 0 is "benchmark"; doc 1 shares a 3-shingle, doc 2 shares none
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "zz alpha beta gamma yy"),
        (2, "one two three four five"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = contamination_hits(
        df, "doc_id", "text", (F.col("doc_id") % 97) == 0, shingle_size=3
    ).collect()
    # doc0 shingles {alpha beta gamma, beta gamma delta}; doc1 shares
    # exactly "alpha beta gamma"; doc2 shares nothing and is absent
    assert {(r["doc_id"], r["n_hits"]) for r in out} == {(1, 1)}


def test_stratified_keep_deterministic_and_rated(spark):
    docs = load_table(spark, SF, "documents")
    kept = stratified_keep(docs, "doc_id", "lang", {"en": 500}, 100)
    a = docs.filter(kept).select("doc_id").collect()
    b = docs.filter(kept).select("doc_id").collect()
    assert {r[0] for r in a} == {r[0] for r in b}  # rerun-stable
    frac_en = (
        docs.filter(F.col("lang") == "en").filter(kept).count()
        / max(docs.filter(F.col("lang") == "en").count(), 1)
    )
    frac_other = (
        docs.filter(F.col("lang") != "en").filter(kept).count()
        / max(docs.filter(F.col("lang") != "en").count(), 1)
    )
    assert 0.35 <= frac_en <= 0.65  # ~50% quota
    assert 0.02 <= frac_other <= 0.20  # ~10% quota


def test_repetition_features_values(spark):
    rows = [
        (1, "a b a b a b"),     # bigrams: ab,ba,ab,ba,ab → 5 total 2 distinct
        (2, "a b c d e"),       # all distinct
        (3, "x"),               # too short for bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_features(df, "text").collect()}
    assert out[1]["dup_bigram_frac"] == pytest.approx(3 / 5)
    assert out[1]["is_repetitive"]
    assert out[2]["dup_bigram_frac"] == 0.0 and not out[2]["is_repetitive"]
    assert out[3]["dup_bigram_frac"] == 0.0
    assert out[3]["dup_trigram_frac"] == 0.0


def test_ivf_topk_recall_and_exactness(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = ivf_topk(emb, queries, k=10, nprobe=4, n_centroids=16).collect()
    exact_dots = {(r["query_id"], r["neighbor_id"]): r["dot"] for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert approx_set, "IVF returned nothing"
    recall = len(set(exact_dots) & approx_set) / len(exact_dots)
    assert recall >= 0.3, f"recall {recall:.2f} too low"
    for r in approx:  # scores on shared pairs are the exact int64 dots
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_dots:
            assert r["dot"] == exact_dots[key]


def test_ivf_probes_bound_candidates(spark):
    """nprobe=1 must only ever return candidates from one inverted list
    per query — strictly fewer or equal hits than nprobe=4."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    one = ivf_topk(emb, queries, k=10, nprobe=1, n_centroids=16)
    four = ivf_topk(emb, queries, k=10, nprobe=4, n_centroids=16)
    assert one.count() <= four.count()


def test_redact_pii_planted(spark):
    from m5_competition_kaggle_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    rows = [
        (1, "mail a.b+c@foo.co.uk ip 192.168.0.1 tel +44 20 7946 0958 end"),
        (2, "no pii here, just 1.5 numbers and a@b"),  # a@b lacks a TLD
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.withColumns(pii_counts("text"))
        .withColumn("red", redact_pii("text"))
        .collect()
    }
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (1, 1, 1)
    assert out[1]["red"] == "mail <EMAIL> ip <IP> tel <PHONE> end"
    assert (out[2]["n_email"], out[2]["n_ip"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[2]["red"] == rows[1][1]


def test_dup_span_features_semantics(spark):
    from m5_competition_kaggle_spark.operators.curation import (
        dup_span_features,
    )

    rows = [
        # docs 1 and 2 share their full 4-token text -> every span dup
        (1, "a b c d"),
        (2, "a b c d"),
        # unique text, 5 tokens -> 2 spans of 4, none duplicated
        (3, "e f g h i"),
        # short doc (< window) -> whole text is one span, unique
        (4, "zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dup_span_features(df, "doc_id", "text", window=4).collect()
    }
    assert (out[1]["n_spans"], out[1]["dup_spans"]) == (1, 1)
    assert out[1]["dup_frac"] == 1.0
    assert (out[2]["n_spans"], out[2]["dup_spans"]) == (1, 1)
    assert (out[3]["n_spans"], out[3]["dup_spans"]) == (2, 0)
    assert out[3]["dup_frac"] == 0.0
    assert (out[4]["n_spans"], out[4]["dup_spans"]) == (1, 0)


def test_dup_spans_intra_doc_repetition_counts(spark):
    """A span repeated WITHIN one document is duplicated too (position
    multiplicity, not document multiplicity)."""
    from m5_competition_kaggle_spark.operators.curation import (
        dup_span_features,
    )

    df = spark.createDataFrame(
        [(1, "x y x y x y")], "doc_id long, text string"
    )
    out = dup_span_features(df, "doc_id", "text", window=2).collect()[0]
    # spans: "x y","y x","x y","y x","x y" -> all 5 positions duplicated
    assert (out["n_spans"], out["dup_spans"]) == (5, 5)


def test_temperature_mix_flattens_skew(spark):
    """α=0.5 flattening on a strongly skewed corpus: the rare source's
    keep probability saturates at 1 (every doc kept) while the head
    source is down-sampled — plus the exact keep rule cross-checked in
    Python (same h64, same integer comparison)."""
    import math

    from m5_competition_kaggle_spark.functions.text import h64_py
    from m5_competition_kaggle_spark.operators.curation import (
        temperature_mix_stats,
    )

    rows = [(i, "head") for i in range(400)] + [
        (1000 + i, "rare") for i in range(16)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {
        r["source"]: r
        for r in temperature_mix_stats(df, "doc_id", "source").collect()
    }
    # Python twin of the integer keep rule
    n = {"head": 400, "rare": 16}
    w = {s: math.floor(math.sqrt(c) * 1000) for s, c in n.items()}
    w_tot, t_target = sum(w.values()), (416 * 3) // 10
    exp = {
        s: sum(
            1
            for i, src in rows
            if src == s
            and (h64_py(str(i)) % 1000000) * w_tot * n[s]
            < 1000000 * t_target * w[s]
        )
        for s in n
    }
    assert out["rare"]["n_kept"] == exp["rare"] == 16  # p capped at 1
    assert out["head"]["n_kept"] == exp["head"] < 400
    # flattening: rare keep fraction strictly above head keep fraction
    assert out["rare"]["n_kept"] * n["head"] > out["head"]["n_kept"] * n["rare"]


def test_bloom_decontamination_guarantees(spark):
    """Bloom membership has NO false negatives (every exact hit is a
    bloom hit) and the observed FP count per doc is non-negative and
    small at this filter load; the bits side must broadcast so the
    corpus probe stays map-side."""
    from pyspark.sql import functions as F

    from m5_competition_kaggle_spark.operators.curation import (
        bloom_contamination_stats,
    )

    docs = load_table(spark, SF, "documents")
    out = bloom_contamination_stats(
        docs, "doc_id", "text", (F.col("doc_id") % 97) == 0, 4
    )
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["false_positives"] >= 0, dict(r.asDict())  # no false negs
        assert r["bloom_hits"] <= r["n_shingles"]
    total_fp = sum(r["false_positives"] for r in rows)
    total_sh = sum(r["n_shingles"] for r in rows)
    assert total_fp <= max(10, total_sh // 100), (total_fp, total_sh)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
