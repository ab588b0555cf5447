"""Structural plan asserts for the staged r15 batch — each
operator's 100 TB claim pinned before registration:

- x176: the gap lag window and the aggregate are keyed by
  event_type — never a global sort, no Python.
- x177: the corpus-sized stages (LSH banding, component iteration)
  stay keyed; the ONLY single-partition shape is the constant-key
  Theil–Sen over the size histogram (the x167 allowance, size-domain
  bounded); the slope attaches by broadcast.
- x178: two keyed centroid aggregates + a keyed (label, pos) join;
  no global window anywhere.
- x179: the leaderboard window keys on day; consecutive-day joins
  are equi joins on the shifted day.
- s27: the Gini assembly inherits the cell shape — windows keyed by
  day, nothing Python, nothing single-partition.
"""

import re

from m5_competition_kaggle_spark.queries import extensions_r15

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


def test_interarrival_keyed_window(spark):
    df = extensions_r15.QUERIES["x176_interarrival_cv2"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "SinglePartition" not in ex
    _assert_jvm_only(ex, "x176")
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*)\)", _optimized(df)
    ):
        first = m.group(1).split(",")[0].strip()
        assert first.startswith("event_type#"), m.group(1)


def test_dup_profile_single_partition_only_in_slope(spark):
    """The one single-partition window must be the Theil–Sen rank
    over histogram pairs (bounded), keyed everywhere else — and the
    component iteration must not be Python."""
    df = extensions_r15.QUERIES["x177_dup_cluster_profile"](
        spark, SF
    )
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    _assert_jvm_only(ex, "x177")
    plan = _optimized(df)
    unkeyed = [
        m.group(1)
        for m in re.finditer(
            r"windowspecdefinition\(([^)]*)\)", plan
        )
        # a window is keyed iff its first element is a partition col
        # (ends in #NNN before the first sort spec)
        if not re.match(
            r"(doc_id|cluster_id|component|node|id_a|grp|band)#",
            m.group(1).split(",")[0].strip(),
        )
    ]
    # the unkeyed windows all belong to the constant-key slope kernel
    # (row_number over the <=|sizes|^2/2 histogram pairs, count over
    # the same) — bounded by the size domain, never the corpus
    assert len(unkeyed) <= 3, unkeyed


def test_centroid_drift_keyed_joins(spark):
    df = extensions_r15.QUERIES["x178_centroid_drift"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "SinglePartition" not in ex
    _assert_jvm_only(ex, "x178")


def test_topk_churn_day_keyed(spark):
    df = extensions_r15.QUERIES["x179_topk_churn"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "SinglePartition" not in ex
    _assert_jvm_only(ex, "x179")
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*)\)", _optimized(df)
    ):
        first = m.group(1).split(",")[0].strip()
        assert first.startswith("day#"), m.group(1)


def test_stream_gini_day_keyed_cells(spark):
    df = extensions_r15.QUERIES["s27_stream_gini"](spark, SF)
    ex = _executed(df)
    assert "CartesianProduct" not in ex
    assert "SinglePartition" not in ex
    _assert_jvm_only(ex, "s27")
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*)\)", _optimized(df)
    ):
        first = m.group(1).split(",")[0].strip()
        assert first.startswith("day#"), m.group(1)
