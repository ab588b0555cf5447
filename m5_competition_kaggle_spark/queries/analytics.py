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


def g9_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all four grouping-set combinations
    in one Expand + aggregate pass — the full-lattice sibling of g4's
    ROLLUP. grouping_id disambiguates subtotal NULLs from data NULLs."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
            "gid",
        )
    )


def g10_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per customer, rolling 7-DAY spend ending
    at each order's date — a value-based frame (peers by timestamp, not
    row position), the frame type q8/q19's ROWS windows don't exercise.
    Grouped sort per customer; no global exchange."""
    o = load_table(spark, sf_dir, "orders")
    # rangeBetween needs a numeric ordering key: epoch seconds. 7 days
    # = 604800 s matches the oracle's INTERVAL 7 DAY exactly (the data's
    # timestamps are date-grained; no DST in the epoch domain either).
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.sum("o_totalprice").over(w).alias("spend_7d"),
            F.count(F.lit(1)).over(w).alias("n_orders_7d"),
        )
        .orderBy("o_orderkey")
    )


def g11_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward fill: daily per-user series from
    events, every missing day materialized and carried forward (LOCF).
    The standard prep step for regular-grid models over irregular event
    streams."""
    from m5_competition_kaggle_spark.operators.timeseries import (
        gap_fill_days,
        locf,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.max("value").alias("day_max"))
    filled = gap_fill_days(daily, ["user_id"], "day")
    return (
        locf(filled, ["user_id"], "day", "day_max", "value_ff")
        .select(
            "user_id",
            "day",
            "value_ff",
            F.col("day_max").isNull().alias("is_gap"),
        )
        .orderBy("user_id", "day")
    )


def g12_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (parts priced above their brand's
    average), decorrelated by hand into agg → broadcast join → filter —
    the plan Catalyst's decorrelation would emit, stated explicitly."""
    p = load_table(spark, sf_dir, "part")
    brand_avg = p.groupBy("p_brand").agg(
        F.avg("p_retailprice").alias("brand_avg")
    )
    return (
        p.join(F.broadcast(brand_avg), "p_brand")
        .filter(F.col("p_retailprice") > F.col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice", "brand_avg")
        .orderBy("p_partkey")
    )


def g13_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity day,
    distinct active users counted per (cohort, activity) day pair.
    Two keyed aggregates + one join on user_id — no global exchange."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date(F.col("ts"))
    cohort = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    active = ev.select("user_id", day.alias("active_day")).distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_day", "active_day")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_day", "active_day")
    )


_PROFILE_COLS = ("l_discount", "l_extendedprice", "l_quantity", "l_tax")


def g14_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style one-pass column profiling: row/null/distinct counts
    and min/max for every numeric lineitem measure, unpivoted to one row
    per column — the stats-collection scan every optimizer and data
    catalog needs.

    Plan: a single aggregate computes all 4 columns' stats in one pass
    over the scan; multiple exact count(DISTINCT) aggregates share it
    via Catalyst's Expand rewrite (one shuffle, map-side partials), and
    the 1-row result is unpivoted driver-free with stack(). At 100 TB
    swap exact distinct counts for approx_count_distinct (HLL++, x17's
    path) — same plan minus the Expand."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows, n_rows - nn_{c}, nd_{c}, mn_{c}, mx_{c}"
        for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
        )
    ).orderBy("col_name")


def g15_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family over customer balances per market
    segment: percent_rank, cume_dist, ntile(4) — the rank functions g3's
    row_number doesn't exercise. Deterministic ordering via the
    (c_acctbal, c_custkey) tie-break; one grouped sort, no global
    exchange before the final presentation ORDER BY."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("c_custkey")
    )


def g16_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per cell (sum + count per return
    flag): one Expand-free single-pass pivot with an explicit value list
    — the multi-measure crosstab q6's single-avg pivot doesn't cover."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_linestatus")
    )


def g17_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    to the previous event exceeds 30 minutes; session id = running count
    of session starts (lag + cumulative sum — two frames over ONE grouped
    sort on user). The explicit window-function mechanism behind s3's
    native session_window, and exactly how a SQL engine without
    session_window has to express it. Comparisons on ts_nanos: integer-
    exact across engines."""
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts_nanos"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    gap_ns = 30 * 60 * 1_000_000_000
    is_new = (
        F.col("ts_nanos") - F.lag("ts_nanos").over(w) > gap_ns
    ).cast("long")
    return (
        ev.withColumn("__new", F.coalesce(is_new, F.lit(1)))
        .withColumn("session_id", F.sum("__new").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_nanos").alias("start_ns"),
            F.max("ts_nanos").alias("end_ns"),
            F.sum("value").alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


def g18_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix per the user timeline
    (Markov-chain counts): lag over one grouped sort, then a two-key
    hash aggregate — the funnel-analysis primitive for arbitrary step
    pairs, complementing s7's two-type interval join."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_nanos", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
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
    "g9_cube_revenue": g9_cube_revenue,
    "g10_range_frame_window": g10_range_frame_window,
    "g11_gap_fill_locf": g11_gap_fill_locf,
    "g12_correlated_subquery": g12_correlated_subquery,
    "g13_cohort_retention": g13_cohort_retention,
    "g14_profile_stats": g14_profile_stats,
    "g15_rank_distribution": g15_rank_distribution,
    "g16_pivot_multi_agg": g16_pivot_multi_agg,
    "g17_sessionize_gaps": g17_sessionize_gaps,
    "g18_transition_counts": g18_transition_counts,
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
    "g9_cube_revenue": """
        SELECT o_orderpriority, o_orderstatus,
               sum(o_totalprice) AS revenue,
               count(*) AS n_orders,
               CAST(grouping(o_orderpriority) * 2
                    + grouping(o_orderstatus) AS BIGINT) AS gid
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority ASC NULLS FIRST,
                 o_orderstatus ASC NULLS FIRST, gid
    """,
    "g10_range_frame_window": """
        SELECT o_orderkey, o_custkey,
               sum(o_totalprice) OVER w AS spend_7d,
               count(*) OVER w AS n_orders_7d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                           AND CURRENT ROW)
        ORDER BY o_orderkey
    """,
    "g11_gap_fill_locf": """
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   max(value) AS day_max
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        ), span AS (
            SELECT user_id, min(day) AS d0, max(day) AS d1
            FROM daily GROUP BY user_id
        ), days AS (
            SELECT user_id,
                   CAST(unnest(generate_series(d0, d1,
                                               INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM span
        ), filled AS (
            SELECT d.user_id, d.day, dl.day_max
            FROM days d LEFT JOIN daily dl
              ON d.user_id = dl.user_id AND d.day = dl.day
        )
        SELECT user_id, day,
               last_value(day_max IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS value_ff,
               day_max IS NULL AS is_gap
        FROM filled
        ORDER BY user_id, day
    """,
    "g12_correlated_subquery": """
        SELECT p_partkey, p_brand, p_retailprice,
               (SELECT avg(p2.p_retailprice) FROM part p2
                WHERE p2.p_brand = p.p_brand) AS brand_avg
        FROM part p
        WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                               WHERE p2.p_brand = p.p_brand)
        ORDER BY p_partkey
    """,
    "g13_cohort_retention": """
        WITH cohort AS (
            SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
            FROM events GROUP BY user_id
        ), active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day
            FROM events
        )
        SELECT c.cohort_day, a.active_day, count(*) AS active_users
        FROM active a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY c.cohort_day, a.active_day
        ORDER BY c.cohort_day, a.active_day
    """,
    "g14_profile_stats": "\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS col_name,
               count(*) AS n_rows,
               count(*) - count({c}) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               min({c}) AS min_val, max({c}) AS max_val
        FROM lineitem"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY col_name",
    "g15_rank_distribution": """
        SELECT c_mktsegment, c_custkey, c_acctbal,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey
    """,
    # Spark pivot leaves empty cells NULL (even for count); NULLIF
    # reproduces that from DuckDB's 0-returning FILTER counts.
    "g16_pivot_multi_agg": """
        SELECT l_linestatus,
               sum(l_quantity) FILTER (l_returnflag = 'A') AS A_qty,
               NULLIF(count(*) FILTER (l_returnflag = 'A'), 0) AS A_n,
               sum(l_quantity) FILTER (l_returnflag = 'N') AS N_qty,
               NULLIF(count(*) FILTER (l_returnflag = 'N'), 0) AS N_n,
               sum(l_quantity) FILTER (l_returnflag = 'R') AS R_qty,
               NULLIF(count(*) FILTER (l_returnflag = 'R'), 0) AS R_n
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "g17_sessionize_gaps": """
        WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_nanos,
                          value
                   FROM events),
        o AS (
            SELECT user_id, event_id, ts_nanos, value,
                   CASE WHEN lag(ts_nanos) OVER w IS NULL THEN 1
                        WHEN ts_nanos - lag(ts_nanos) OVER w
                             > 1800000000000 THEN 1
                        ELSE 0 END AS is_new
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_nanos, event_id)
        ), s AS (
            SELECT *,
                   CAST(sum(is_new) OVER (PARTITION BY user_id
                       ORDER BY ts_nanos, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM o
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts_nanos) AS start_ns,
               max(ts_nanos) AS end_ns,
               sum(value) AS total_value
        FROM s GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "g18_transition_counts": """
        WITH t AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY epoch_ns(ts), event_id) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type AS next_type,
               count(*) AS n_transitions
        FROM t WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
        ORDER BY prev_type, next_type
    """,
}
