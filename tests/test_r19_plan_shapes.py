"""Structural plan asserts for the staged r19 batch — each
operator's 100 TB claim pinned before registration:

- x191: vocabulary reduces via TakeOrdered to 512 rows BEFORE the
  bounded rank window and the constant-key slope kernel; no Python.
- x192: the band join keeps its user equi key; the type grid is the
  only broadcast-NL side (bounded 5×5).
- x193: the only single-partition shape is the calendar-bounded
  per-day running total (the x124 allowance).
- x194: pure JVM marker scoring (chained built-ins), two keyed
  aggregates, no cartesian.
"""

import re

from m5_competition_kaggle_spark.queries import extensions_r19

SF = "/root/testdata/sf0.001"

PY_MARKERS = ("BatchEvalPython", "ArrowEvalPython",
              "FlatMapGroupsInPandas", "MapInPandas")


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_jvm_only(ex: str, q: str) -> None:
    for marker in PY_MARKERS:
        assert marker not in ex, (q, marker)


def test_zipf_takeordered_before_window(spark):
    df = extensions_r19.QUERIES["x191_zipf_slope"](spark, SF)
    ex = _executed(df)
    assert "TakeOrderedAndProject" in ex  # the top-512 reduction
    _assert_jvm_only(ex, "x191")


def test_implication_user_keyed_band_join(spark):
    df = extensions_r19.QUERIES["x192_implication_matrix"](
        spark, SF
    )
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    _assert_jvm_only(ex, "x192")
    assert ("SortMergeJoin" in ex or "ShuffledHashJoin" in ex
            or "BroadcastHashJoin" in ex)


def test_user_growth_keyed_then_bounded_walk(spark):
    df = extensions_r19.QUERIES["x193_user_growth"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    _assert_jvm_only(ex, "x193")
    assert ex.count("Exchange SinglePartition") <= 1


def test_langid_confusion_jvm_only(spark):
    df = extensions_r19.QUERIES["x194_langid_confusion"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "SinglePartition" not in ex
    _assert_jvm_only(ex, "x194")
