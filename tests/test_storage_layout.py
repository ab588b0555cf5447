"""Plan-asserted storage-layout tests: bucketed co-located joins must
not shuffle, partitioned reads must prune directories at plan time.
These pin the write-once/join-free contract that amortizes 100 TB
fact-to-fact joins (see sources/bucketing.py)."""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.bucketing import (
    co_located_join,
    write_bucketed,
    write_partitioned,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    write_bucketed(
        li, "t_li_b", ["l_orderkey"], 8, path=str(tmp_path / "li")
    )
    write_bucketed(
        o, "t_o_b", ["o_orderkey"], 8, path=str(tmp_path / "o")
    )
    # at test scale the tiny side auto-broadcasts (which also skips the
    # bucketed scan); force the sort-merge path a 100 TB fact-to-fact
    # join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(
            spark, "t_li_b", "t_o_b",
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        # co-located bucketed scans: the join needs NO shuffle of either
        # side — this is the whole point of paying bucketBy at write time
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan, plan
        # semantics unchanged vs the plain join
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_o_b")


def test_bucketed_join_differing_buckets_still_correct(spark, tmp_path):
    """Mismatched bucket counts lose the optimization but never the
    answer (Spark shuffles the smaller-bucketed side)."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey")
    o = load_table(spark, SF, "orders").select("o_orderkey")
    write_bucketed(li, "t_li_m", ["l_orderkey"], 8,
                   path=str(tmp_path / "li"))
    write_bucketed(o, "t_o_m", ["o_orderkey"], 4,
                   path=str(tmp_path / "o"))
    try:
        joined = co_located_join(
            spark, "t_li_m", "t_o_m",
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_m")
        spark.sql("DROP TABLE IF EXISTS t_o_m")


def test_partitioned_read_prunes(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "ev_part")
    write_partitioned(ev, path, ["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "view")
    plan = _plan(back)
    # the filter must land in PartitionFilters (planning-time directory
    # pruning), not as a post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan
    expect = ev.filter(F.col("event_type") == "view").count()
    assert back.count() == expect
