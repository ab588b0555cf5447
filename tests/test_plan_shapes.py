"""Structural plan asserts for the scale-critical query shapes.

Wall-clock benchmarks are noisy at test scale; these pin the PLAN
properties that matter at 100 TB so a regression is caught structurally:
no single-partition exchanges in x16, no driver-side collect in x12's
certified path, a broadcast verify join in x2, AQE on the q4 fact join.
"""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.similarity import (
    embedding_near_dup_pairs,
    exact_near_dup_pairs,
)
from m5_competition_kaggle_spark.queries.core import q4_fact_left_join
from m5_competition_kaggle_spark.queries.extensions import (
    x2_dedup_minhash,
    x12_embed_near_dup,
    x16_curation_pipeline,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_x9_brute_force_is_fully_distributed(spark):
    """r2 audit's last scale-killer: brute_force_topk must not collect
    the query set to the driver. The certified plan is the cogrouped
    block matmul — building it triggers no driver-side action, and the
    plan carries the cogroup stage instead of a Python-broadcast
    mapInPandas fed by a collect."""
    from m5_competition_kaggle_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    df = brute_force_topk(emb, queries, k=10)  # lazy build
    jobs_after = len(tracker.getJobIdsForGroup() or [])
    assert jobs_after == jobs_before, "plan construction ran a Spark job"
    plan = _plan(df)
    assert "FlatMapCoGroupsInPandas" in plan, plan


def test_x10_lsh_query_side_not_hinted(spark):
    """lsh_topk must not FORCE a query-side broadcast (the certified
    query set scales with the corpus) — AQE may still pick one at
    runtime from actual sizes, which is the point."""
    from m5_competition_kaggle_spark.operators.similarity import lsh_topk

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0)
    logical = (
        lsh_topk(emb, q, k=10)
        ._jdf.queryExecution()
        .logical()
        .toString()
    )
    assert "ResolvedHint" not in logical, logical


def test_x16_no_single_partition_exchange(spark):
    """The token-budget cumsum must not funnel the corpus through one
    partition (r1 verdict: global Window.orderBy = scale-killer). The
    per-bucket rewrite keeps every exchange hash/range-partitioned."""
    plan = _plan(x16_curation_pipeline(spark, SF))
    assert "SinglePartition" not in plan, plan


def test_x12_certified_path_is_lazy_and_join_bucketed(spark):
    """x12 must not collect the vector table to the driver (r1 verdict).
    The LSH path is a plain lazy plan: an equi-join on bucket, no
    Python/pandas stage anywhere."""
    df = x12_embed_near_dup(spark, SF)
    plan = _plan(df)
    assert "MapInPandas" not in plan, plan
    assert "Join" in plan and "bucket" in plan, plan


def test_x12_lsh_pairs_are_exact_subset(spark):
    """Precision check: every LSH-bucketed pair is a true near-dup pair
    with the identical int64 dot (the bucket join only bounds candidates;
    it must never invent or rescore a pair)."""
    emb = load_table(spark, SF, "embeddings")
    lsh = {
        (r["id_a"], r["id_b"]): r["dot"]
        for r in embedding_near_dup_pairs(
            emb, 350_000, num_planes=4, dim=64
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["dot"]
        for r in exact_near_dup_pairs(emb, 350_000).collect()
    }
    assert lsh, "LSH path returned nothing"
    assert set(lsh) <= set(exact)
    assert all(exact[k] == v for k, v in lsh.items())
    # recall is approximate by design, but must be non-trivial
    assert len(lsh) / len(exact) >= 0.1


def test_x2_verify_join_broadcasts_candidates(spark):
    """The minhash verify stage joins the (small, LSH-bounded) candidate
    pair set back to the shingle table — that side must broadcast, never
    shuffle the shingles by pair key."""
    plan = _plan(x2_dedup_minhash(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_q4_fact_join_runs_under_aqe(spark):
    """The fact-fact shuffle join must stay adaptive so skew/coalesce
    re-planning can kick in at scale."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = q4_fact_left_join(spark, SF)
    plan = _plan(df)
    assert "AdaptiveSparkPlan" in plan, plan
    df.count()  # force execution so the adaptive plan finalizes
    final = _plan(df)
    assert "AQEShuffleRead" in final or "BroadcastHashJoin" in final, final


def test_x20_benchmark_side_broadcasts(spark):
    """Decontamination must broadcast the (small) benchmark shingle set;
    the growing corpus side must never shuffle by shingle."""
    from m5_competition_kaggle_spark.queries.llm_curation import (
        x20_decontaminate,
    )

    plan = _plan(x20_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_x23_ivf_centroids_broadcast(spark):
    """IVF assignment/probing join against the centroid table must be a
    broadcast (the centroid table is tiny at any corpus scale)."""
    from m5_competition_kaggle_spark.queries.llm_curation import (
        x23_sim_topk_ivf,
    )

    plan = _plan(x23_sim_topk_ivf(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # candidate scoring joins assigned x probes on cid — an equi join,
    # not a cross product over the corpus
    assert "cid" in plan


def test_x30_topk_never_sorts_globally(spark):
    """Vocabulary top-k must plan as TakeOrderedAndProject (per-partition
    top-k + k-row merge), never a full Sort of the vocabulary."""
    from m5_competition_kaggle_spark.queries.llm_curation import (
        x30_vocab_topk,
    )

    plan = _plan(x30_vocab_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_g10_range_frame_partitioned(spark):
    """The 7-day RANGE frame must run per customer (hash-partitioned
    window), not as a global single-partition sort."""
    from m5_competition_kaggle_spark.queries.analytics import (
        g10_range_frame_window,
    )

    plan = _plan(g10_range_frame_window(spark, SF))
    assert "SinglePartition" not in plan, plan
    assert "RangeFrame" in plan, plan


def test_g11_gap_fill_no_cross_join(spark):
    """Densification must come from per-key sequence+explode, never a
    cross join against a global calendar."""
    from m5_competition_kaggle_spark.queries.analytics import (
        g11_gap_fill_locf,
    )

    plan = _plan(g11_gap_fill_locf(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate explode" in plan or "explode" in plan, plan


def test_x10_dedups_on_keys_not_vectors(spark):
    """lsh_topk must deduplicate table collisions with a hash aggregate
    keyed on (query_id, neighbor_id) ids only — never a distinct that
    shuffles a 64-element vector per candidate row. (Vectors are attached
    once per unique pair after the dedup, so the L-way bucket fan-out
    stays 24 bytes/row.)"""
    from m5_competition_kaggle_spark.operators.similarity import lsh_topk

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    plan = _plan(lsh_topk(emb, q, k=10))
    agg_keys = plan.split("HashAggregate(keys=[")
    assert len(agg_keys) > 1, plan
    assert not any(
        "__q_vec" in seg.split("]")[0] or "__v_vec" in seg.split("]")[0]
        for seg in agg_keys[1:]
    ), plan


def test_no_inferred_generator_filters(spark):
    """The engine session must keep InferFiltersFromGenerate excluded:
    with it, every explode(<computed array>) re-evaluates its input in a
    pre-exchange Filter (measured: 3s of single-threaded scan-stage CPU
    on x20 at sf0.1)."""
    from m5_competition_kaggle_spark.operators.dedup import doc_shingles

    docs = load_table(spark, SF, "documents")
    plan = _plan(doc_shingles(docs, "doc_id", "text", 3))
    # the inferred filter manifests as size(...) > 0 below the exchange
    assert "size(array_distinct" not in plan.split("Exchange")[-1], plan
