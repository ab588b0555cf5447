"""Skew helpers, CSV/parquet round-trips, and hypothesis property tests."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# --------------------------------------------------------------------- skew


def test_salted_aggregate_matches_plain(spark):
    rows = [("hot", float(i)) for i in range(5000)]
    rows += [(f"k{i}", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, v double")
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"))
        .collect()
    }
    from m5_competition_kaggle_spark.operators.skew import salted_aggregate

    salted = {
        r["k"]: (r["sum_v"], r["count_v"])
        for r in salted_aggregate(df, ["k"], "v", salt_buckets=8).collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert salted[k][0] == pytest.approx(plain[k][0])


def test_salted_left_join_matches_plain(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(1000)] + [("cold", 1), ("miss", 2)],
        "k string, lv int",
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], "k string, rv string"
    )
    from m5_competition_kaggle_spark.operators.skew import salted_left_join

    plain = left.join(right, ["k"], "left")
    salted = salted_left_join(left, right, ["k"], salt_buckets=4)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    # the salted plan's join key includes the salt → hot key spread out
    assert salted.count() == 1002


# ----------------------------------------------------------------------- io


def test_csv_and_parquet_round_trip(spark, tmp_path):
    from m5_competition_kaggle_spark.sources import io
    from m5_competition_kaggle_spark.sources.catalog import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "customer")
    csv_path = str(tmp_path / "cust_csv")
    io.write_csv(df, csv_path)
    back = io.read_csv(spark, csv_path, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    pq_path = str(tmp_path / "cust_pq")
    io.write_parquet(df, pq_path, partition_by=("c_mktsegment",))
    # partition pruning: an equality filter must read only one directory
    seg = df.select("c_mktsegment").first()[0]
    pruned = io.read_parquet(spark, pq_path).filter(
        F.col("c_mktsegment") == seg
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(c_mktsegment" in plan
    assert pruned.count() == df.filter(F.col("c_mktsegment") == seg).count()

    assert io.stage_done(pq_path)
    io.drop_stage(pq_path)
    assert not io.stage_done(pq_path)


def test_json_and_orc_round_trip(spark, tmp_path):
    from m5_competition_kaggle_spark.sources import io
    from m5_competition_kaggle_spark.sources.catalog import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "nation")
    want = sorted(map(tuple, df.collect()))

    jp = str(tmp_path / "nation_json")
    io.write_json(df, jp)
    assert sorted(map(tuple, io.read_json(spark, jp, df.schema).collect())) == want

    op = str(tmp_path / "nation_orc")
    io.write_orc(df, op)
    back = io.read_orc(spark, op)
    assert sorted(map(tuple, back.collect())) == want
    # ORC pushdown survives like parquet
    plan = (
        back.filter(F.col("n_nationkey") == 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]" in plan


# ---------------------------------------------------------------- properties


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(min_value=1, max_value=10),
)
def test_lag_of_lead_restores_values(spark, values, k):
    """∀ series: lag(k) ∘ lead(k) is identity where defined (SURVEY §5.4)."""
    from m5_competition_kaggle_spark.operators.window import with_lags, with_lead

    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(values)], "id string, d int, v double"
    )
    out = with_lead(df, ["v"], k, ["id"], ["d"], "lead_{col}")
    out = with_lags(out, "lead_v", [k], ["id"], ["d"], "{col}_lag_{k}")
    got = {r["d"]: r[f"lead_v_lag_{k}"] for r in out.collect()}
    n = len(values)
    # lead_v[d] = values[d+k] (or NULL); lagging it back by k gives
    # values[d] exactly for d ≥ k, NULL for the first k rows.
    for d in range(n):
        assert got[d] == (values[d] if d >= k else None), (d, k, n)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.floats(min_value=0, max_value=100, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    window=st.integers(min_value=1, max_value=8),
)
def test_trailing_mean_null_count_property(spark, values, window):
    """NULL count per group == min(window, group_size) for a full series —
    pandas min_periods semantics (SURVEY §5.4)."""
    from m5_competition_kaggle_spark.operators.window import with_trailing_means

    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(values)], "id string, d int, v double"
    )
    out = with_trailing_means(df, "v", [window], ["id"], ["d"], "roll_{k}")
    nulls = out.filter(F.col(f"roll_{window}").isNull()).count()
    assert nulls == min(window, len(values))
