"""Plumbing tests for multimodal/transform.py — the resize and
feature-extract stages that complete the ops.py quartet. The decode
libraries are absent from this container, so the FAKE codec paths are
what certify: real Spark plumbing (schema, Arrow batching, binary
round-trip) with deterministic byte-level stand-ins, plus the
binary → embedding → certified-ANN-top-k composition end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.multimodal.ops import (
    to_binary_assets,
)
from m5_competition_kaggle_spark.multimodal.transform import (
    FEATURE_DIM,
    extract_features,
    resize_assets,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_resize_fake_is_deterministic_decimation(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    assets = to_binary_assets(docs, "doc_id", "text")
    out = resize_assets(assets, target_w=8, target_h=8, mode="fake")
    assert dict(out.dtypes)["content"] == "binary"
    rows = {r["doc_id"]: r for r in out.collect()}
    src = {r["doc_id"]: bytes(r["content"]) for r in assets.collect()}
    assert rows.keys() == src.keys()
    for doc_id, r in rows.items():
        b = src[doc_id]
        k = max(1, len(b) // 64)
        assert bytes(r["content"]) == b[::k]
        assert (r["width"], r["height"]) == (8, 8)
    # monotone: a larger target keeps at least as many bytes
    big = {
        r["doc_id"]: len(bytes(r["content"]))
        for r in resize_assets(
            assets, target_w=64, target_h=64, mode="fake"
        ).collect()
    }
    for doc_id, r in rows.items():
        assert big[doc_id] >= len(bytes(r["content"]))


def test_extract_features_is_a_real_embedding_column(spark):
    """Features are normalized 16-bin byte histograms: nonnegative,
    summing to ~1, identical for identical payloads — and the column
    feeds the certified brute-force cosine top-k kernel unchanged
    (binary -> embedding -> ANN end-to-end)."""
    from m5_competition_kaggle_spark.operators.similarity import (
        brute_force_topk,
    )

    docs = load_table(spark, SF, "documents").limit(30)
    assets = to_binary_assets(docs, "doc_id", "text")
    feats = extract_features(assets, mode="fake")
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        v = r["feature"]
        assert len(v) == FEATURE_DIM
        assert all(x >= 0.0 for x in v)
        assert abs(sum(v) - 1.0) < 1e-6
    # identical payloads -> identical features
    dup = to_binary_assets(
        docs.limit(1).select(
            F.lit(999_999).alias("doc_id"), "text"
        ),
        "doc_id",
        "text",
    )
    base_doc = docs.limit(1).collect()[0]["doc_id"]
    f_dup = extract_features(dup, mode="fake").collect()[0]["feature"]
    f_base = {r["doc_id"]: r["feature"] for r in rows}[base_doc]
    assert f_dup == f_base
    # the embedding column flows into the certified ANN kernel
    corpus = feats.select(
        F.col("doc_id").alias("vec_id"),
        F.col("feature").alias("embedding"),
    )
    queries = corpus.limit(2)
    topk = brute_force_topk(corpus, queries, k=3)
    got = topk.groupBy("query_id").count().collect()
    assert {r["count"] for r in got} == {3}


def test_real_modes_raise_at_the_library_boundary(spark):
    docs = load_table(spark, SF, "documents").limit(2)
    assets = to_binary_assets(docs, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|real"):
        resize_assets(assets, mode="real").collect()
    with pytest.raises(Exception, match="NotImplementedError|real"):
        extract_features(assets, mode="real").collect()
