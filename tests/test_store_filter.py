"""Store-restriction knob: the reference's per-store shard selection
(``pipeline.py:35``) as partition pruning over the staged features."""

import os

from pyspark.sql import functions as F

from test_m5_pipeline_e2e import build_fixtures


def test_store_filter_prunes_partitions(spark, tmp_path):
    from m5_competition_kaggle_spark.plans.m5_pipeline import process_inputs
    from m5_competition_kaggle_spark.sources import io

    sales, cal, prices, _ = build_fixtures()
    base = process_inputs(
        spark.createDataFrame(sales),
        spark.createDataFrame(cal),
        spark.createDataFrame(prices),
    )
    path = str(tmp_path / "base")
    io.write_parquet(base, path, partition_by=("store_id",))
    assert sorted(
        d for d in os.listdir(path) if d.startswith("store_id=")
    ) == ["store_id=CA_1", "store_id=TX_1"]

    pruned = io.read_parquet(spark, path).filter(F.col("store_id") == "CA_1")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "store_id" in plan
    assert pruned.select("store_id").distinct().collect()[0][0] == "CA_1"
    assert pruned.count() == base.filter(F.col("store_id") == "CA_1").count()
