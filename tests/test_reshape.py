"""R1–R3 unit tests: unpivot/pivot/keyed-update (SURVEY §5.2).

Adversarial cases: duplicate pivot cells (mean agg), missing pivot values,
NULL update values (pandas ``update`` rule), unmatched update keys,
stack-fallback equivalence.
"""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.reshape import (
    keyed_update,
    pivot_avg,
    unpivot,
    unpivot_via_stack,
)


def test_unpivot_roundtrip_shape(spark):
    df = spark.createDataFrame(
        [("r1", 1.0, 2.0, 3.0), ("r2", 4.0, None, 6.0)],
        "id string, d_1 double, d_2 double, d_3 double",
    )
    out = unpivot(df, ["id"], ["d_1", "d_2", "d_3"], "d", "units")
    rows = {(r["id"], r["d"]): r["units"] for r in out.collect()}
    assert len(rows) == 6  # NULL values are kept as rows (pd.melt semantics)
    assert rows[("r2", "d_2")] is None
    assert rows[("r1", "d_3")] == 3.0


def test_unpivot_stack_fallback_equivalent(spark):
    df = spark.createDataFrame(
        [("r1", 1.0, 2.0), ("r2", 4.0, None)],
        "id string, a double, b double",
    )
    native = unpivot(df, ["id"], ["a", "b"], "k", "v").collect()
    stacked = unpivot_via_stack(df, ["id"], ["a", "b"], "k", "v").collect()
    assert sorted(map(tuple, native)) == sorted(map(tuple, stacked))


def test_pivot_avg_duplicate_cells_and_missing_values(spark):
    df = spark.createDataFrame(
        [("x", "F1", 1.0), ("x", "F1", 3.0), ("x", "F2", 5.0), ("y", "F2", 7.0)],
        "id string, day string, v double",
    )
    out = pivot_avg(df, "id", "day", "v", ["F1", "F2", "F3"])
    rows = {r["id"]: r for r in out.collect()}
    assert rows["x"]["F1"] == pytest.approx(2.0)  # duplicate cells averaged
    assert rows["x"]["F2"] == pytest.approx(5.0)
    assert rows["x"]["F3"] is None  # declared-but-absent pivot value
    assert rows["y"]["F1"] is None  # missing cell


def test_keyed_update_null_rule_and_unmatched(spark):
    base = spark.createDataFrame(
        [("a", 1.0, "keep"), ("b", 2.0, "keep"), ("c", 3.0, "keep")],
        "k string, bal double, tag string",
    )
    upd = spark.createDataFrame(
        [("a", 100.0), ("b", None), ("zz", 999.0)],
        "k string, bal double",
    )
    out = keyed_update(base, upd, ["k"], ["bal"])
    rows = {r["k"]: r for r in out.collect()}
    assert rows["a"]["bal"] == 100.0  # non-NULL new value overwrites
    assert rows["b"]["bal"] == 2.0  # NULL new value does NOT (pandas rule)
    assert rows["c"]["bal"] == 3.0  # unmatched base row preserved
    assert "zz" not in rows  # update-only keys never insert (update, not merge)
    assert all(r["tag"] == "keep" for r in rows.values())  # untouched cols
    assert out.columns == base.columns  # schema contract preserved


def test_wide_unpivot_plans(spark):
    """1,941-column unpivot (the reference's real width) must plan and run."""
    n = 1941
    row = tuple(["series_1"] + [float(i) for i in range(n)])
    df = spark.createDataFrame(
        [row], "id string, " + ", ".join(f"d_{i+1} double" for i in range(n))
    )
    out = unpivot(df, ["id"], [f"d_{i+1}" for i in range(n)], "d", "v")
    assert out.count() == n
    got = out.filter(F.col("d") == "d_1941").collect()[0]["v"]
    assert got == float(n - 1)
