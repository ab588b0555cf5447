"""Structural plan asserts for the staged r9b batch — the 100 TB
claims each operator's docstring makes, pinned before registration:

- x144/s21 AUC: the rank window is KEYED (partitioned by the group),
  never a global sort; no row-at-a-time Python UDF anywhere.
- x142 silhouette: the centroid table reaches the per-point pass as a
  BROADCAST (1-row list, BNLJ), and the distance math stays JVM-side
  (no Arrow/Pandas stage at all).
- x141 SBC / x145 ECE / x147 tracking signal: pure keyed-aggregate
  plans — no window, no join (beyond ECE's 1-row merge).
- x146 demand gaps: no unbounded-FOLLOWING frame (the O(n²) trap).
"""

import re

from m5_competition_kaggle_spark.queries import extensions_r9b

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_auc_window_is_keyed_not_global(spark):
    for q in ("x144_day_auc", "s21_stream_auc"):
        plan = _optimized(extensions_r9b.QUERIES[q](spark, SF))
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            spec = m.group(1)
            # a global window's spec starts directly with the ORDER
            # BY column list; the day key must appear as partition
            assert "day" in spec.split(",")[0], (q, spec)
        assert "UNBOUNDED FOLLOWING" not in plan


def test_silhouette_broadcasts_centroids_and_stays_jvm(spark):
    plan = _executed(extensions_r9b.QUERIES["x142_silhouette"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    for marker in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, marker


def test_aggregate_only_queries_have_no_window(spark):
    for q in ("x141_sbc_classes", "x145_calibration_ece"):
        plan = _optimized(extensions_r9b.QUERIES[q](spark, SF))
        assert "windowspecdefinition" not in plan, q
        assert "BatchEvalPython" not in plan


def test_demand_gaps_has_no_unbounded_following(spark):
    plan = _optimized(
        extensions_r9b.QUERIES["x146_demand_gaps"](spark, SF)
    )
    assert "UNBOUNDED FOLLOWING" not in plan
    assert "BatchEvalPython" not in plan


def test_tracking_signal_single_keyed_window(spark):
    plan = _optimized(
        extensions_r9b.QUERIES["x147_tracking_signal"](spark, SF)
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "lag window missing"
    assert all("event_type" in s.split(",")[0] for s in specs), specs
    assert "UNBOUNDED FOLLOWING" not in plan
