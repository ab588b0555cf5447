"""Extension-op unit tests: dedup, similarity, text, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.dedup import (
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from m5_competition_kaggle_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("today", "tomorrow")),  # near dup of 1
        (4, "completely different text about spark query engines at scale ok"),
        (5, "short text"),  # shorter than shingle width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_groups(docs):
    out = exact_dup_groups(docs, "doc_id", "text").collect()
    by_canon = {r["canonical_id"]: r["dup_count"] for r in out}
    assert by_canon[1] == 2  # docs 1,2 identical
    assert by_canon[3] == 1 and by_canon[4] == 1 and by_canon[5] == 1


def test_minhash_lsh_finds_planted_near_dup(docs):
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=8, shingle_size=3,
        threshold=0.5,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0  # exact dup always survives
    assert (1, 3) in got or (2, 3) in got  # near dup caught by some band
    assert all(a < 4 and b < 4 for a, b in got)  # 4 and 5 unrelated


def test_ngram_jaccard_exact_values(spark):
    # doc1 tokens a b c d -> shingles {ab, bc, cd}; doc2 a b c e -> {ab, bc, ce}
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    out = ngram_jaccard_pairs(df, "doc_id", "text", shingle_size=2,
                              threshold=0.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_common"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert r["jaccard"] == pytest.approx(2 / 4)


def test_simhash_identical_and_near(docs):
    sims = simhash(docs, "doc_id", "text", bits=32)
    m = {r["doc_id"]: r["simhash"] for r in sims.collect()}
    assert m[1] == m[2]  # identical text → identical simhash
    assert 0 <= m[1] < (1 << 32)
    pairs = simhash_near_pairs(sims, "doc_id", max_hamming=3, bits=32).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got[(1, 2)] == 0
    assert (1, 4) not in got  # unrelated text not within hamming 3


def test_brute_force_topk_exact(spark):
    # 2-d vectors with known ranking for query (1, 0)
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.5, 0.5]),
        (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    out = brute_force_topk(df, q, k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]
    assert out[0]["dot"] == 900 * 1000  # quantized integer math


def test_brute_force_topk_self_match_keeps_all_k_slots(spark):
    # Regression (r3 advice, similarity.py sentinel): masking self-matches
    # with int64.min overflowed under the argsort's negation (-int64.min
    # == int64.min), sorting the self-match FIRST and eating one local
    # top-k slot — with the query in the same block as its vectors and
    # k == N-1, the rank-k real neighbor was silently dropped.
    rows = [(i, [float(10 - i), 1.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    out = (
        brute_force_topk(df, q, k=4, n_vec_blocks=1, n_query_blocks=1)
        .orderBy("rank")
        .collect()
    )
    assert [r["neighbor_id"] for r in out] == [1, 2, 3, 4]


def test_lsh_topk_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = lsh_topk(
        emb, queries, k=10, num_planes=4, num_tables=8, dim=64
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert approx_set, "LSH returned nothing"
    # every LSH hit must be a real vector pair scored identically
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"recall {recall:.2f} too low"
    # sanity: LSH dots agree with brute-force dots on shared pairs
    exact_dots = {(r["query_id"], r["neighbor_id"]): r["dot"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_dots:
            assert r["dot"] == exact_dots[key]


def test_arrow_bucketize_matches_jvm_buckets(spark):
    """The Arrow-matmul bucketizer must produce bit-identical buckets to
    the JVM expression path (lsh_bucket_col) — same hyperplanes, same
    quantization, pure int64 both sides."""
    from m5_competition_kaggle_spark.operators.similarity import (
        _bucketize_arrow,
        hyperplanes,
        lsh_bucket_col,
        quantize_expr,
    )

    emb = load_table(spark, SF, "embeddings").limit(100)
    P, L = 4, 3
    arrow = {
        (r["vid"], r["table"]): r["bucket"]
        for r in _bucketize_arrow(emb, "vid", "vec_id", "embedding", P, L, 64)
        .collect()
    }
    staged = emb.select(
        F.col("vec_id").alias("vid"), quantize_expr("embedding").alias("__q")
    )
    jvm = {}
    for t in range(L):
        for r in staged.select(
            "vid", lsh_bucket_col("__q", hyperplanes(P, 64, t)).alias("b")
        ).collect():
            jvm[(r["vid"], t)] = r["b"]
    assert arrow == jvm


def test_multimodal_decode_stub(spark):
    from m5_competition_kaggle_spark.multimodal.ops import (
        decode_assets,
        sample_frames,
        to_binary_assets,
    )

    docs = load_table(spark, SF, "documents").limit(20)
    assets = to_binary_assets(docs, "doc_id", "text")
    assert dict(assets.dtypes)["content"] == "binary"
    meta = decode_assets(assets, "doc_id", mode="fake")
    rows = meta.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["width"] == 64 + r["n_bytes"] % 577
        assert 1 <= r["n_frames"] <= 24
    frames = sample_frames(meta, every_n=8)
    assert frames.count() >= 20  # ≥1 frame per asset
    with pytest.raises(Exception, match="NotImplementedError|real"):
        decode_assets(assets, "doc_id", mode="real").collect()
