"""Structural plan asserts for the staged r12 batch — each
operator's 100 TB claim pinned before registration:

- x162: the sampled pair join is a broadcast NL join (never a
  CartesianProduct) and the capture recurrence is pure JVM column
  arithmetic — no Python anywhere.
- x163: assignment fans the corpus against the BROADCAST codebook;
  no cartesian, no Python; the decision table's global aggregate is
  the only 1-row merge.
- x164: encode is a broadcast join against the m×k codebook; the
  per-(vector, subspace) argmin window is keyed, never global.
- x165: the packing inherits prefix.py's shape — no single-partition
  exchange, no unbounded-FOLLOWING frame.
- x166: the term shortlist/stats are broadcast; candidate reranking
  and both eval joins stay keyed; vocabulary top-N plans as
  TakeOrdered, not a global sort.
- s23/s24: the day-cell aggregation is keyed; both assemblies keep
  their certified kernels' keyed-window shapes.
"""

import re

from m5_competition_kaggle_spark.queries import extensions_r12

SF = "/root/testdata/sf0.001"

PY_MARKERS = ("BatchEvalPython", "ArrowEvalPython",
              "FlatMapGroupsInPandas", "MapInPandas")


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_lsh_band_power_bnlj_jvm_only(spark):
    ex = _executed(
        extensions_r12.QUERIES["x162_lsh_band_power"](spark, SF)
    )
    assert "CartesianProduct" not in ex
    assert "BroadcastNestedLoopJoin" in ex
    for marker in PY_MARKERS:
        assert marker not in ex, marker


def test_ivf_recluster_broadcast_codebook(spark):
    ex = _executed(
        extensions_r12.QUERIES["x163_ivf_recluster"](spark, SF)
    )
    assert "CartesianProduct" not in ex
    for marker in PY_MARKERS:
        assert marker not in ex, marker
    assert "BroadcastNestedLoopJoin" in ex or "BroadcastHashJoin" in ex


def test_pq_distortion_keyed_argmin(spark):
    df = extensions_r12.QUERIES["x164_pq_distortion"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    for marker in PY_MARKERS:
        assert marker not in ex, marker
    # encode argmin is keyed by (__id, s) — never a global window
    plan = _optimized(df)
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        first = m.group(1).split(",")[0]
        assert "__id" in first or "__w" in first, m.group(1)


def test_shard_packing_no_single_partition(spark):
    df = extensions_r12.QUERIES["x165_shard_packing_audit"](spark, SF)
    ex = _executed(df)
    assert "SinglePartition" not in ex
    assert "UNBOUNDED FOLLOWING" not in _optimized(df).upper()
    for marker in PY_MARKERS:
        assert marker not in ex, marker


def test_bm25_rerank_takeordered_and_broadcasts(spark):
    df = extensions_r12.QUERIES["x166_bm25_rerank_eval"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    for marker in PY_MARKERS:
        assert marker not in ex, marker
    # r14: the BM25 shortlist is eagerly checkpointed (it feeds five
    # subtrees), so the vocab top-N no longer appears in the composed
    # plan — assert it where it now lives, on the shortlist pipeline
    # itself: TakeOrdered (per-partition top-N + bounded merge), never
    # a global sort.
    from m5_competition_kaggle_spark.operators.retrieval import (
        bm25_topk,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    short = bm25_topk(
        docs, "doc_id", "text", n_terms=5, min_token_len=4, k=20
    )
    assert "TakeOrderedAndProject" in _executed(short)


def test_trend_twins_keyed_kernels(spark):
    for q in ("s23_stream_changepoint", "s24_stream_theil_sen"):
        df = extensions_r12.QUERIES[q](spark, SF)
        ex = _executed(df)
        assert "CartesianProduct" not in ex, q
        for marker in PY_MARKERS:
            assert marker not in ex, (q, marker)
        plan = _optimized(df)
        for m in re.finditer(
            r"windowspecdefinition\(([^)]*)\)", plan
        ):
            # the kernels key every window by the series key (named
            # `key` in the cells, `k` inside theil_sen_slope)
            first = m.group(1).split(",")[0].strip()
            assert re.match(r"(key|k)#", first), (q, m.group(1))
