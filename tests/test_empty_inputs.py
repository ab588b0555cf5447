"""Empty-input robustness: operators must return empty (correctly-typed)
results — not throw — when a filter upstream leaves nothing, which is
routine at 100 TB (a partition pruned to zero, a benchmark split with no
docs, a dedup pass finding no pairs)."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.curation import (
    bloom_contamination_stats,
    chunk_documents,
    contamination_hits,
)
from m5_competition_kaggle_spark.operators.dedup import (
    exact_dup_groups,
    minhash_lsh_pairs,
)
from m5_competition_kaggle_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    pagerank_int,
)
from m5_competition_kaggle_spark.operators.prefix import pack_into_shards


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_dedup_ops_on_empty_corpus(spark):
    e = _empty_docs(spark)
    assert exact_dup_groups(e, "doc_id", "text").count() == 0
    assert minhash_lsh_pairs(e, "doc_id", "text").count() == 0


def test_graph_ops_on_empty_edges(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs, "id_a", "id_b").count() == 0
    assert dedup_clusters(pairs).count() == 0
    assert pagerank_int(pairs).count() == 0


def test_curation_ops_on_empty_inputs(spark):
    e = _empty_docs(spark)
    assert chunk_documents(e, "doc_id", "text", 32, 24).count() == 0
    # benchmark split empty: nothing can be contaminated
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
    )
    no_bench = F.lit(False)
    assert contamination_hits(docs, "doc_id", "text", no_bench, 4).count() == 0
    out = bloom_contamination_stats(docs, "doc_id", "text", no_bench, 4)
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["bloom_hits"] == 0 and r["false_positives"] == 0
               for r in rows)


def test_pack_into_shards_empty(spark):
    chunks = spark.createDataFrame(
        [], "doc_id long, chunk_idx long, n_chunk_tokens long"
    )
    assert pack_into_shards(
        chunks, "n_chunk_tokens", ("doc_id", "chunk_idx"), 4096
    ).count() == 0
