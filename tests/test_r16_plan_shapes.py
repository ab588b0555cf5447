"""Structural plan asserts for the staged r16 batch — each
operator's 100 TB claim pinned before registration:

- x180: the transition model joins back BROADCAST; windows keyed by
  user; the rate is the only 1-row merge; no Python.
- x181: day cells + a keyed lag window — nothing global, no Python.
- x182: broadcast m×k centroid table, keyed scoring aggregates; no
  cartesian, no global window, no Python.
- x183: one keyed user aggregate + one 1-row global merge; no Python.
- s28: EXACTLY ONE Arrow stage (the deliberate grouped-map crossing —
  FlatMapGroupsInPandas), everything around it keyed; no cartesian,
  no row-at-a-time Python UDF.
"""

import re

from m5_competition_kaggle_spark.queries import extensions_r16

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


def test_entropy_rate_broadcast_model_user_windows(spark):
    df = extensions_r16.QUERIES["x180_entropy_rate"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    _assert_jvm_only(ex, "x180")
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*)\)", _optimized(df)
    ):
        first = m.group(1).split(",")[0].strip()
        assert first.startswith("user_id#"), m.group(1)


def test_runs_test_type_keyed_windows(spark):
    df = extensions_r16.QUERIES["x181_runs_test"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "SinglePartition" not in ex
    _assert_jvm_only(ex, "x181")
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*)\)", _optimized(df)
    ):
        first = m.group(1).split(",")[0].strip()
        assert first.startswith("event_type#"), m.group(1)


def test_label_margin_broadcast_centroids(spark):
    df = extensions_r16.QUERIES["x182_label_margin"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "SinglePartition" not in ex
    assert "BroadcastHashJoin" in ex  # the m×k centroid table
    _assert_jvm_only(ex, "x182")


def test_conversion_lag_one_keyed_agg(spark):
    df = extensions_r16.QUERIES["x183_conversion_lag"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    _assert_jvm_only(ex, "x183")
    # the final 1-row merge is the only single-partition shape
    assert ex.count("SinglePartition") <= 1


def test_stateful_transitions_single_arrow_crossing(spark):
    df = extensions_r16.QUERIES["s28_stateful_transitions"](
        spark, SF
    )
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "BatchEvalPython" not in ex  # never row-at-a-time
    assert ex.count("FlatMapGroupsInPandas") == 1
