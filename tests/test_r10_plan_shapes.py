"""Structural plan asserts for the staged r10 batch — the 100 TB
claims each operator's docstring makes, pinned before registration:

- x148 isotonic: every window is KEYED (segment / segment+j_bin) and
  the suffix-min uses the REVERSED growing frame, never an
  unbounded-FOLLOWING frame; no Python evaluation anywhere (the whole
  minimax is relational).
- x149 changepoint: one keyed prefix window + keyed top-1, no
  unbounded-FOLLOWING, no Python.
- x150 RBO: the weight ladder is a literal CASE (JVM), the only
  Arrow stage is the certified brute-force block matmul it reuses.
- s22 ECE twin: pure keyed aggregates over bounded cells, no window
  at all, no Python.
"""

import re

from m5_competition_kaggle_spark.queries import extensions_r10

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_isotonic_windows_keyed_no_unbounded_following(spark):
    df = extensions_r10.QUERIES["x148_isotonic_calibration"](spark, SF)
    plan = _optimized(df)
    assert "UNBOUNDED FOLLOWING" not in plan.upper()
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "segment" in m.group(1).split(",")[0], m.group(1)
    for marker in ("BatchEvalPython", "ArrowEvalPython",
                   "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in _executed(df), marker


def test_changepoint_single_keyed_pass_no_python(spark):
    df = extensions_r10.QUERIES["x149_changepoint"](spark, SF)
    plan = _optimized(df)
    assert "UNBOUNDED FOLLOWING" not in plan.upper()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "prefix/rank windows missing"
    assert all("event_type" in s.split(",")[0] for s in specs), specs
    assert "BatchEvalPython" not in _executed(df)


def test_rbo_weight_ladder_is_jvm_case(spark):
    df = extensions_r10.QUERIES["x150_rank_rbo"](spark, SF)
    ex = _executed(df)
    # the only Python stage is the reused block-matmul cogroup of the
    # certified exact baseline — never a row-at-a-time UDF
    assert "BatchEvalPython" not in ex
    assert "FlatMapCoGroupsInPandas" in ex  # brute_force_topk reuse


def test_adida_keyed_windows_jvm_fold(spark):
    df = extensions_r10.QUERIES["x151_adida"](spark, SF)
    plan = _optimized(df)
    assert "UNBOUNDED FOLLOWING" not in plan.upper()
    # the span min/max windows are keyed by the part key
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert m.group(1).split(",")[0].startswith("k#"), m.group(1)
    ex = _executed(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython",
                   "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in ex, marker


def test_forecastability_is_aggregate_only(spark):
    df = extensions_r10.QUERIES["x152_forecastability"](spark, SF)
    plan = _optimized(df)
    assert "windowspecdefinition" not in plan
    assert "BatchEvalPython" not in _executed(df)


def test_theil_sen_pairs_keyed_no_python(spark):
    df = extensions_r10.QUERIES["x153_theil_sen"](spark, SF)
    plan = _optimized(df)
    assert "UNBOUNDED FOLLOWING" not in plan.upper()
    # the pair join and both windows are keyed on the series key
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert m.group(1).split(",")[0].startswith("k#"), m.group(1)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "BatchEvalPython" not in ex


def test_method_select_keyed_no_python_no_cartesian(spark):
    df = extensions_r10.QUERIES["x154_method_select"](spark, SF)
    plan = _optimized(df)
    assert "UNBOUNDED FOLLOWING" not in plan.upper()
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    # the only unkeyed join is the 1-row cutoff broadcast (BNLJ)
    assert "BatchEvalPython" not in ex
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert m.group(1).split(",")[0].startswith("k#"), m.group(1)


def test_kmeans_broadcasts_centroids_stays_jvm(spark):
    df = extensions_r10.QUERIES["x155_kmeans_lloyd"](spark, SF)
    ex = _executed(df)
    assert "BroadcastNestedLoopJoin" in ex  # k-row centroid fan
    for marker in ("BatchEvalPython", "ArrowEvalPython",
                   "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in ex, marker


def test_stream_ece_twin_is_aggregate_only(spark):
    df = extensions_r10.QUERIES["s22_stream_ece"](spark, SF)
    plan = _optimized(df)
    assert "windowspecdefinition" not in plan
    ex = _executed(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython",
                   "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in ex, marker
