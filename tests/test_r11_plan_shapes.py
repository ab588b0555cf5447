"""Structural plan asserts for the staged r11 batch — each
operator's 100 TB claim pinned before registration:

- x156: the trained probe keeps the certified IVF shape — broadcast
  codebook, keyed windows; the only Arrow stage is the reused exact
  block matmul.
- x157: NO single-partition exchange anywhere (the distributed
  prefix scan is the point), windows keyed by scan partition/decile.
- x158/x159: the sample pair join is a broadcast NL join, never a
  CartesianProduct; all math JVM-side.
- x160: the certified MinHash machinery + two keyed source joins,
  no Python anywhere.
"""

import re

from m5_competition_kaggle_spark.queries import extensions_r11

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_trained_recall_broadcast_codebook(spark):
    df = extensions_r11.QUERIES["x156_trained_recall"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "BatchEvalPython" not in ex
    assert "FlatMapCoGroupsInPandas" in ex  # exact baseline reuse
    assert "BroadcastNestedLoopJoin" in ex  # k-row codebook fans


def test_vocab_growth_no_single_partition_window(spark):
    df = extensions_r11.QUERIES["x157_vocab_growth"](spark, SF)
    plan = _optimized(df)
    assert "UNBOUNDED FOLLOWING" not in plan.upper()
    # every window is keyed (__pid scan partitions / decile pick) —
    # a global window's spec would START with the order column list
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        first = m.group(1).split(",")[0]
        assert "__pid" in first or "decile" in first, m.group(1)
    assert "BatchEvalPython" not in _executed(df)


def test_pair_histograms_use_bnlj_not_cartesian(spark):
    for q in ("x158_pair_distances", "x159_jaccard_sweep"):
        ex = _executed(extensions_r11.QUERIES[q](spark, SF))
        assert "CartesianProduct" not in ex, q
        assert "BroadcastNestedLoopJoin" in ex, q
        assert "BatchEvalPython" not in ex, q


def test_cross_source_dups_stays_jvm(spark):
    df = extensions_r11.QUERIES["x160_cross_source_dups"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    for marker in ("BatchEvalPython", "ArrowEvalPython",
                   "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in ex, marker
