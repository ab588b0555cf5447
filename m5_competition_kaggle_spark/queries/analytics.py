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


def g4_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total) — the
    grouping-sets path (Expand + aggregate). NULL group keys mark
    subtotal rows; grouping_id disambiguates real NULLs."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


def g5_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: distinct customers and order-date span per
    priority (two-phase distinct-agg plan)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
        .orderBy("o_orderpriority")
    )


def g6_semi_anti_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS: customers labeled by whether they have any
    order > 200000 — left-semi and left-anti joins unioned."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    with_big = c.join(big, "c_custkey", "left_semi").select(
        "c_custkey", F.lit("big_spender").alias("bucket")
    )
    without = c.join(big, "c_custkey", "left_anti").select(
        "c_custkey", F.lit("regular").alias("bucket")
    )
    return with_big.unionByName(without).orderBy("c_custkey")


def g7_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT: custkeys appearing in both halves of the date
    range vs only the first half."""
    o = load_table(spark, sf_dir, "orders")
    first = o.filter(F.col("o_orderdate") < "1996-01-01").select("o_custkey")
    second = o.filter(F.col("o_orderdate") >= "1996-01-01").select("o_custkey")
    both = first.intersect(second).select(
        "o_custkey", F.lit("both").alias("presence")
    )
    # subtract = SQL EXCEPT (set semantics); exceptAll would leave
    # higher-multiplicity keys that also appear in the second half
    only_first = first.subtract(second).select(
        "o_custkey", F.lit("first_only").alias("presence")
    )
    return both.unionByName(only_first).orderBy("o_custkey", "presence")


def g8_median_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark ``percentile`` ==
    SQL-standard continuous quantile == DuckDB ``quantile_cont``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        # one array-percentile call: a single value buffer + sort per
        # group serves both quantiles (two separate aggs would each
        # buffer and sort the whole group)
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5D, 0.9D))").alias(
                "__p"
            )
        )
        .select(
            "l_returnflag",
            F.col("__p")[0].alias("median_price"),
            F.col("__p")[1].alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


QUERIES = {
    "g1_pricing_summary": g1_pricing_summary,
    "g2_revenue_by_nation": g2_revenue_by_nation,
    "g3_top_customers_per_segment": g3_top_customers_per_segment,
    "g4_rollup_revenue": g4_rollup_revenue,
    "g5_distinct_agg": g5_distinct_agg,
    "g6_semi_anti_joins": g6_semi_anti_joins,
    "g7_set_ops": g7_set_ops,
    "g8_median_quantiles": g8_median_quantiles,
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
    "g4_rollup_revenue": """
        SELECT r_name, n_name, sum(o_totalprice) AS revenue,
               CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS gid
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
    """,
    "g5_distinct_agg": """
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders,
               min(o_orderdate) AS first_order,
               max(o_orderdate) AS last_order
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "g6_semi_anti_joins": """
        SELECT c_custkey,
               CASE WHEN EXISTS (SELECT 1 FROM orders
                                 WHERE o_custkey = c_custkey
                                   AND o_totalprice > 200000)
                    THEN 'big_spender' ELSE 'regular' END AS bucket
        FROM customer ORDER BY c_custkey
    """,
    "g7_set_ops": """
        WITH first_half AS (SELECT o_custkey FROM orders
                            WHERE o_orderdate < TIMESTAMP '1996-01-01'),
             second_half AS (SELECT o_custkey FROM orders
                             WHERE o_orderdate >= TIMESTAMP '1996-01-01')
        SELECT o_custkey, 'both' AS presence
        FROM (SELECT o_custkey FROM first_half
              INTERSECT SELECT o_custkey FROM second_half)
        UNION ALL
        SELECT o_custkey, 'first_only' AS presence
        FROM (SELECT DISTINCT o_custkey FROM first_half
              EXCEPT SELECT o_custkey FROM second_half)
        ORDER BY o_custkey, presence
    """,
    "g8_median_quantiles": """
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS median_price,
               quantile_cont(l_extendedprice, 0.9) AS p90_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
}
