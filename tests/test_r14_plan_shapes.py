"""Structural plan asserts for the staged r14 batch — each
operator's 100 TB claim pinned before registration:

- x171: the transition model joins back BROADCAST (|event_type|²
  rows); the timeline lag window and the per-user aggregate are keyed
  by user; top-15 plans as TakeOrdered, never a global sort.
- x172: lineitem reduces to one row per part BEFORE the dimension
  join; the Gini cell windows are keyed by brand; nothing single-
  partition, nothing Python.
- x173: the lag pairing is a day-keyed equi join (never a
  CartesianProduct); the peak normalization is a keyed aggregate.
- x174: doc-term/corpus-term aggregates stay keyed; the 1-row corpus
  total is the only broadcast-NL side; top-15 is TakeOrdered.
- x175/s26: the CvM assembly inherits the ksdist cell shape — every
  window keyed by the partition column (grp / day), no row-at-a-time
  Python anywhere.
"""

import re

from m5_competition_kaggle_spark.queries import extensions_r14

SF = "/root/testdata/sf0.001"

PY_MARKERS = ("BatchEvalPython", "ArrowEvalPython",
              "FlatMapGroupsInPandas", "MapInPandas")


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _assert_jvm_only(ex: str, q: str) -> None:
    for marker in PY_MARKERS:
        assert marker not in ex, (q, marker)


def test_markov_broadcast_model_takeordered(spark):
    df = extensions_r14.QUERIES["x171_markov_surprisal"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "BroadcastHashJoin" in ex  # the |types|^2 model
    assert "TakeOrderedAndProject" in ex  # top-15, not a sort
    _assert_jvm_only(ex, "x171")
    # every window keys on the timeline owner (user_id), never global
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*)\)", _optimized(df)
    ):
        first = m.group(1).split(",")[0].strip()
        assert first.startswith("user_id#"), m.group(1)


def test_gini_keyed_cells_no_single_partition(spark):
    df = extensions_r14.QUERIES["x172_sales_gini"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "SinglePartition" not in ex
    _assert_jvm_only(ex, "x172")
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*)\)", _optimized(df)
    ):
        first = m.group(1).split(",")[0].strip()
        assert first.startswith("p_brand#"), m.group(1)


def test_xcov_day_keyed_equi_join(spark):
    df = extensions_r14.QUERIES["x173_xcov_leadlag"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    _assert_jvm_only(ex, "x173")
    # the t+k pairing must plan as an equi join on the shifted day
    assert "SortMergeJoin" in ex or "ShuffledHashJoin" in ex \
        or "BroadcastHashJoin" in ex


def test_kl_novelty_keyed_aggs_takeordered(spark):
    df = extensions_r14.QUERIES["x174_doc_kl_novelty"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "TakeOrderedAndProject" in ex
    _assert_jvm_only(ex, "x174")
    # the only broadcast-NL side is the 1-row corpus total
    assert ex.count("BroadcastNestedLoopJoin") <= 1


def test_cvm_windows_keyed_by_partition(spark):
    for q, keypat in (
        ("x175_cvm_drift", r"grp#"),
        ("s26_stream_cvm", r"day#"),
    ):
        df = extensions_r14.QUERIES[q](spark, SF)
        ex = _executed(df)
        assert "CartesianProduct" not in ex, q
        _assert_jvm_only(ex, q)
        for m in re.finditer(
            r"windowspecdefinition\(([^)]*)\)", _optimized(df)
        ):
            first = m.group(1).split(",")[0].strip()
            assert re.match(keypat, first), (q, m.group(1))
