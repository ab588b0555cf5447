"""Structural plan asserts for the staged r18 batch — each
operator's 100 TB claim pinned before registration:

- x188: the dropped-doc set attaches by a keyed left join; no
  cartesian, no Python (the LSH/CC stages are the audited x24
  shapes).
- x189: every running-CDF window partitions by the (src_a, src_b)
  pair — never global; the pair grid is the only broadcast-NL side
  (bounded: 10 rows).
- x190: windows keyed by event_type; the 24-hour grid is the only
  broadcast-NL side.
- s29: EXACTLY ONE Arrow stage (the grouped-map crossing); no
  row-at-a-time Python, no cartesian.
"""

import re

from m5_competition_kaggle_spark.queries import extensions_r18

SF = "/root/testdata/sf0.001"

PY_MARKERS = ("BatchEvalPython", "ArrowEvalPython",
              "FlatMapGroupsInPandas", "MapInPandas")


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_dedup_stats_keyed_no_python(spark):
    df = extensions_r18.QUERIES["x188_dedup_weighted_stats"](
        spark, SF
    )
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    for marker in PY_MARKERS:
        assert marker not in ex, marker


def test_ks_matrix_pair_keyed_windows(spark):
    df = extensions_r18.QUERIES["x189_source_ks_matrix"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "SinglePartition" not in ex
    for marker in PY_MARKERS:
        assert marker not in ex, marker
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*)\)", _optimized(df)
    ):
        first = m.group(1).split(",")[0].strip()
        assert first.startswith(("src_a#", "source#")), m.group(1)


def test_diurnal_type_keyed(spark):
    df = extensions_r18.QUERIES["x190_diurnal_profile"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "SinglePartition" not in ex
    for marker in PY_MARKERS:
        assert marker not in ex, marker
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*)\)", _optimized(df)
    ):
        first = m.group(1).split(",")[0].strip()
        assert first.startswith("event_type#"), m.group(1)


def test_conversions_single_arrow_crossing(spark):
    df = extensions_r18.QUERIES["s29_user_conversions"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "BatchEvalPython" not in ex
    assert ex.count("FlatMapGroupsInPandas") == 1
