"""Group-aggregation analytics queries (engine completeness beyond parity).

The reference has NO group-by aggregation (SURVEY §2 notes the absence) —
but an analytics engine over this star schema must do it well, and these
exercise the paths the parity queries don't: multi-column hash aggregation
with map-side partial agg, join→agg pipelines with broadcast dims, and
top-k-per-group via window ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import load_table


def g1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: two-key groupBy with 8 aggregates over lineitem.
    Whole-stage-codegen'd hash aggregate with map-side partials — the
    canonical scan-heavy OLAP plan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def g2_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join → agg: customer revenue rolled up to nation/region with
    broadcast dimension joins (TPC-H Q5 shape)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


def g3_top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by order revenue within each market segment —
    join → agg → window rank, deterministic tie-break on custkey."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .join(c, o.o_custkey == c.c_custkey)
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("spend"), F.asc("c_custkey")
    )
    return (
        spend.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "spend", "rnk")
        .orderBy("c_mktsegment", "rnk")
    )


QUERIES = {
    "g1_pricing_summary": g1_pricing_summary,
    "g2_revenue_by_nation": g2_revenue_by_nation,
    "g3_top_customers_per_segment": g3_top_customers_per_segment,
}

ORACLES = {
    "g1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                   AS sum_charge,
               avg(l_quantity) AS avg_qty,
               avg(l_extendedprice) AS avg_price,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "g2_revenue_by_nation": """
        SELECT r_name, n_name,
               sum(o_totalprice) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    "g3_top_customers_per_segment": """
        WITH spend AS (
            SELECT o_custkey, sum(o_totalprice) AS spend
            FROM orders GROUP BY o_custkey
        ), ranked AS (
            SELECT c.c_mktsegment, c.c_custkey, s.spend,
                   row_number() OVER (PARTITION BY c.c_mktsegment
                                      ORDER BY s.spend DESC, c.c_custkey)
                       AS rnk
            FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
        )
        SELECT c_mktsegment, c_custkey, spend, rnk
        FROM ranked WHERE rnk <= 3
        ORDER BY c_mktsegment, rnk
    """,
}
