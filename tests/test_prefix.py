"""Tests for the two-phase global prefix sum and sequence packing —
equivalence with the single-partition formulation on planted data, and
the shard-boundary rule. Cross-engine values are pinned by the x26
oracle (scripts/check_oracle.py)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from m5_competition_kaggle_spark.operators.prefix import (
    global_running_sum,
    pack_into_shards,
)


def test_global_running_sum_matches_single_partition(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    got = {
        r["k"]: r["running_sum"]
        for r in global_running_sum(df, "v", ("k",)).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        r["k"]: r["ref"]
        for r in df.withColumn("ref", F.sum("v").over(w)).collect()
    }
    assert got == expected


def test_global_running_sum_no_single_partition_exchange(spark):
    df = spark.createDataFrame([(i, 1) for i in range(100)], "k long, v long")
    plan = global_running_sum(df, "v", ("k",))._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pack_into_shards_boundary_rule(spark):
    # sizes 3,3,3 with budget 4: start offsets 0,3,6 -> shards 0,0,1
    df = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 3)], "k long, n long"
    )
    got = {
        r["k"]: r["shard_id"]
        for r in pack_into_shards(df, "n", ("k",), 4).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1}


# ---------------------------------------------------------------- properties

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=60
    ),
    budget=st.integers(min_value=1, max_value=64),
)
def test_pack_shards_matches_python_scan(spark, sizes, budget):
    """∀ size sequences: distributed packing == a sequential Python scan
    (shard = start offset div budget)."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "k long, n long"
    ).repartition(5)
    got = {
        r["k"]: r["shard_id"]
        for r in pack_into_shards(df, "n", ("k",), budget).collect()
    }
    offset, expected = 0, {}
    for i, s in enumerate(sizes):
        expected[i] = offset // budget
        offset += s
    assert got == expected
