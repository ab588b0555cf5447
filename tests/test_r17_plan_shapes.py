"""Structural plan asserts for the staged r17 batch — each
operator's 100 TB claim pinned before registration:

- x184: adjacency via slice/zip (no self-join), one keyed bigram
  aggregate, 1-row broadcast of the winning phrase, TakeOrdered for
  the top-1 — no cartesian, no Python, no global window.
- x185: user-keyed equi join with the time band residual — never a
  cartesian or broadcast-NL blowup on the corpus side.
- x186: every window keyed by the timeline owner; top-10 plans as
  TakeOrdered, not a global sort.
- x187: the ONLY single-partition shape is the calendar-minute-
  bounded cell walk (the x124 allowance) after the keyed user
  aggregate.
"""

import re

from m5_competition_kaggle_spark.queries import extensions_r17

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


def test_phrase_search_no_self_join(spark):
    df = extensions_r17.QUERIES["x184_phrase_search"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "TakeOrderedAndProject" in ex  # top-1 phrase
    assert "BroadcastHashJoin" in ex  # the 1-row phrase
    _assert_jvm_only(ex, "x184")


def test_followed_by_keyed_band_join(spark):
    df = extensions_r17.QUERIES["x185_followed_by"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    _assert_jvm_only(ex, "x185")
    # the band join must keep its user equi key (SMJ/SHJ/BHJ), never
    # degrade to a nested-loop over the corpus
    assert ("SortMergeJoin" in ex or "ShuffledHashJoin" in ex
            or "BroadcastHashJoin" in ex)


def test_path_signatures_user_keyed_windows(spark):
    df = extensions_r17.QUERIES["x186_path_signatures"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "TakeOrderedAndProject" in ex  # top-10
    _assert_jvm_only(ex, "x186")
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*)\)", _optimized(df)
    ):
        first = m.group(1).split(",")[0].strip()
        assert first.startswith("user_id#"), m.group(1)


def test_conversion_quantiles_bounded_cell_walk(spark):
    df = extensions_r17.QUERIES["x187_conversion_lag_quantiles"](
        spark, SF
    )
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    _assert_jvm_only(ex, "x187")
    # exactly the allowed single-partition cell walk, nothing more
    assert ex.count("Exchange SinglePartition") <= 2
