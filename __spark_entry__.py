"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``m5_competition_kaggle_spark.queries``: the driver runs
``entry(spark)`` as a smoke check, then each ``queries()[name]`` at sf=0.01
against ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the M5-shaped feature chain (lags + trailing means +
    time features + deterministic label encode) over the ``events`` series
    table — the reference's core workload re-expressed as one lazy plan
    (reference ``pipeline.py:79-128``)."""
    from pyspark.sql import functions as F

    from m5_competition_kaggle_spark.functions.datetime import time_features
    from m5_competition_kaggle_spark.functions.encode import label_encode
    from m5_competition_kaggle_spark.operators.window import (
        with_lags,
        with_trailing_means,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    order = ["ts_nanos", "event_id"]
    out = with_lags(ev, "value", [1, 2, 7], ["user_id"], order)
    out = with_trailing_means(out, "value", [7], ["user_id"], order)
    out = time_features(out, "ts")
    out = label_encode(out, "event_type", "event_type_code")
    return out.orderBy("event_id").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "value_lag_1",
        "value_lag_2",
        "value_lag_7",
        "value_roll_mean_7",
        "quarter",
        "week",
        "day",
        "dayofweek",
        "is_weekend",
        F.col("event_type_code").cast("long").alias("event_type_code"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from m5_competition_kaggle_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from m5_competition_kaggle_spark.queries import all_oracles

    return all_oracles()
