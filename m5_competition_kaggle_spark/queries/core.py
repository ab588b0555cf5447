"""SURVEY §2.1 queries Q1–Q17 — one per reference operator family.

Every query is built from the engine's operator library (not ad-hoc SQL) so
the oracle check certifies the operators themselves. Column names/types are
aligned with the DuckDB oracle on both sides (the driver's compare hashes
values under sorted column names — SURVEY §7.4 float/naming watch items).

Reference evidence for each operator family is cited in the operator
modules; this file cites the query → family mapping inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.datetime import (
    dayofweek_pandas,
    is_weekend,
)
from m5_competition_kaggle_spark.functions.encode import label_encode
from m5_competition_kaggle_spark.operators.relational import (
    filter_between,
    filter_eq,
    filter_not_null,
    last_n_distinct_min,
    left_join,
    select_new_columns,
    union_all,
)
from m5_competition_kaggle_spark.operators.reshape import (
    keyed_update,
    pivot_avg,
    unpivot,
)
from m5_competition_kaggle_spark.operators.window import (
    lag_col,
    lead_col,
    series_window,
    trailing_mean_col,
)
from m5_competition_kaggle_spark.sources.catalog import load_table


def q1_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — S1/S2 scan, P1 equality filter, P5 projection."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        filter_eq(li, "l_returnflag", "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


def q2_range_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 — P2 between filter on date, P3 null filter."""
    o = load_table(spark, sf_dir, "orders")
    out = filter_between(o, "o_orderdate", "1995-01-01", "1996-12-31")
    out = filter_not_null(out, ["o_totalprice"])
    return out.select("o_orderkey", "o_totalprice").orderBy("o_orderkey")


def q3_broadcast_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 — J1 broadcast left joins onto bounded dimensions."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    r = load_table(spark, sf_dir, "region").withColumnRenamed(
        "r_regionkey", "n_regionkey"
    )
    out = left_join(c, n, ["c_nationkey"], broadcast_right=True)
    out = left_join(out, r, ["n_regionkey"], broadcast_right=True)
    return out.select("c_custkey", "n_name", "r_name").orderBy("c_custkey")


def q4_fact_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 — J2 fact↔fact left join (shuffle join; AQE may pick hash)."""
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    o = load_table(spark, sf_dir, "orders")
    out = left_join(
        li, o.select("o_orderkey", "o_orderdate", "o_orderpriority"), ["o_orderkey"]
    )
    return (
        out.select(
            F.col("o_orderkey").alias("l_orderkey"),
            "l_linenumber",
            "o_orderdate",
            "o_orderpriority",
        ).orderBy("l_orderkey", "l_linenumber")
    )


def q5_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 — R1 unpivot (the reference's defining wide→long melt,
    ``pipeline.py:46-48``)."""
    p = load_table(spark, sf_dir, "part").withColumn(
        "p_size", F.col("p_size").cast("double")
    )
    out = unpivot(
        p, ["p_partkey"], ["p_size", "p_retailprice"], "attr", "val"
    )
    return out.orderBy("p_partkey", "attr")


def q6_pivot_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — R2/A4 pivot with mean agg, explicit value list."""
    li = load_table(spark, sf_dir, "lineitem")
    out = pivot_avg(li, "l_linestatus", "l_returnflag", "l_quantity", ["A", "N", "R"])
    return out.orderBy("l_linestatus")


def _events_window(spark: SparkSession, sf_dir: str):
    # Order by raw nanos: the oracle's ORDER BY ts is nanosecond-precise,
    # and micros-truncated timestamps could tie where nanos don't.
    ev = load_table(spark, sf_dir, "events")
    w = series_window(["user_id"], ["ts_nanos", "event_id"])
    return ev, w


def q7_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 — W1 lag over explicit series order (``pipeline.py:102-110``)."""
    ev, w = _events_window(spark, sf_dir)
    return (
        ev.select("event_id", lag_col("value", 7, w).alias("lag_7"))
        .orderBy("event_id")
    )


def q8_trailing_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 — W2 trailing mean with pandas min_periods semantics."""
    ev, w = _events_window(spark, sf_dir)
    return (
        ev.select(
            "event_id",
            trailing_mean_col("value", 7, w).alias("roll_mean_7"),
        ).orderBy("event_id")
    )


def q9_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 — W3 lead (future label attach, ``pipeline.py:172-176``)."""
    ev, w = _events_window(spark, sf_dir)
    return (
        ev.select("event_id", lead_col("value", 7, w).alias("lead_7"))
        .orderBy("event_id")
    )


def q10_tail_distinct_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 — A1/A2/O3: the temporal-split cutoff (``pipeline.py:245-246``)."""
    o = load_table(spark, sf_dir, "orders")
    return last_n_distinct_min(o, "o_orderdate", 20).withColumnRenamed(
        "min_o_orderdate", "min_d"
    )


def q11_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 — O1/O2 union-all of partials + global sort
    (``pipeline.py:339-351``)."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_orderkey").alias("k"), F.lit("hi").alias("src")
    )
    lo = o.filter(F.col("o_totalprice") <= 100000).select(
        F.col("o_orderkey").alias("k"), F.lit("lo").alias("src")
    )
    return union_all([hi, lo]).orderBy("k", "src")


def q12_regex_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 — F1 regex-extract+cast (``pipeline.py:62-64``), F2 string
    concat replacing the reference's row-wise Python lambda
    (``pipeline.py:373``) with a codegen'd built-in."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.regexp_extract("p_name", r"(\d+)", 1).try_cast("long").alias("n"),
            F.concat(F.lit("F"), F.col("p_size").cast("string")).alias("tag"),
        ).orderBy("p_partkey")
    )


def q13_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 — F3–F5 date parts with the pandas dayofweek convention
    (``utils.py:10-23``; SURVEY §7.4 convention watch item)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.quarter("ts").cast("long").alias("q"),
            F.weekofyear("ts").cast("long").alias("wk"),
            dayofweek_pandas("ts").cast("long").alias("dow"),
            is_weekend("ts").cast("long").alias("is_weekend"),
        ).orderBy("event_id")
    )


def q14_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 — F6 date+interval, F7 day-index-from-min, A3 global min.

    The scalar min is computed as a 1-row aggregate then broadcast-joined,
    not a global window — the fact side never re-shuffles."""
    o = load_table(spark, sf_dir, "orders")
    min_d = o.agg(F.min("o_orderdate").alias("__min_d"))
    return (
        o.crossJoin(F.broadcast(min_d))
        .select(
            "o_orderkey",
            F.date_add("o_orderdate", 28).alias("plus28"),
            (F.datediff("o_orderdate", "__min_d") + 1).cast("long").alias("day_idx"),
        )
        .orderBy("o_orderkey")
    )


def q15_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 — F9 deterministic lexicographic label encode (``utils.py:42-47``)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        label_encode(c, "c_mktsegment", "code")
        .select("c_custkey", F.col("code").cast("long").alias("code"))
        .orderBy("c_custkey")
    )


def q16_keyed_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 — R3 keyed update overlay with pandas ``update`` NULL rule:
    NULL new values must NOT overwrite (``pipeline.py:377-378``)."""
    c = load_table(spark, sf_dir, "customer")
    updates = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 6 == 0, F.lit(None).cast("double"))
            .otherwise(F.col("c_acctbal") + 100.0)
            .alias("c_acctbal"),
        )
    )
    out = keyed_update(c, updates, ["c_custkey"], ["c_acctbal"])
    return out.select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey")


def q17_feature_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 — P6 column-set-difference projection + J3 feature left join
    (``pipeline.py:162-169``)."""
    ev = load_table(spark, sf_dir, "events")
    feat = ev.select("event_id", "value", (F.col("value") * 7).alias("v7"))
    feat = select_new_columns(feat, ev, ["event_id"])
    out = left_join(ev, feat, ["event_id"])
    return out.select("event_id", "value", "v7").orderBy("event_id")


def q18_feature_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 — the composite M5-shaped feature chain (the flagship ``entry``
    query with an oracle): lags + min_periods trailing mean + lead label +
    time features + deterministic label encode, one window shuffle."""
    from m5_competition_kaggle_spark.functions.datetime import time_features
    from m5_competition_kaggle_spark.operators.window import (
        with_lags,
        with_lead,
        with_trailing_means,
    )

    ev = load_table(spark, sf_dir, "events")
    order = ["ts_nanos", "event_id"]
    out = with_lags(ev, "value", [1, 7], ["user_id"], order)
    out = with_trailing_means(out, "value", [7], ["user_id"], order)
    out = with_lead(out, ["value"], 7, ["user_id"], order)
    out = time_features(out, "ts")
    out = label_encode(out, "event_type", "event_type_code")
    return (
        out.select(
            "event_id",
            "user_id",
            "value",
            "value_lag_1",
            "value_lag_7",
            "value_roll_mean_7",
            F.col("pred_value").alias("value_lead_7"),
            F.col("quarter").cast("long").alias("q"),
            F.col("dayofweek").cast("long").alias("dow"),
            F.col("is_weekend").cast("long").alias("is_weekend"),
            F.col("event_type_code").cast("long").alias("event_type_code"),
        ).orderBy("event_id")
    )


def q19_rolling_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 — generalized trailing aggregates (sum/min/max beyond the
    reference's mean-only W2), same min_periods guard, one window
    shuffle."""
    from m5_competition_kaggle_spark.operators.window import trailing_agg_col

    ev, w = _events_window(spark, sf_dir)
    return (
        ev.select(
            "event_id",
            trailing_agg_col("value", 7, w, "sum").alias("roll_sum_7"),
            trailing_agg_col("value", 7, w, "min").alias("roll_min_7"),
            trailing_agg_col("value", 7, w, "max").alias("roll_max_7"),
        ).orderBy("event_id")
    )


def q20_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 — ranking-function family (absent from the reference, SURVEY §2
    frame-spec note): rank / dense_rank / percent_rank / ntile / cume_dist
    over one window spec."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.cume_dist().over(w).alias("cdist"),
        ).orderBy("c_custkey")
    )


def q21_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 — string-function breadth: case, pad, substring, replace,
    token extraction, edit distance."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.lpad("p_type", 25, ".").alias("type_pad"),
            F.substring("p_name", 1, 8).alias("name8"),
            F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
            F.element_at(F.split("p_type", " "), 1).alias("type_head"),
            F.levenshtein("p_brand", "p_type").cast("long").alias("edit_dist"),
            F.length("p_name").cast("long").alias("name_len"),
        ).orderBy("p_partkey")
    )


def q22_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 — nested/array column ops over the embedding vectors:
    element access, slicing, higher-order transform/filter/aggregate —
    all codegen'd, no UDFs (the array<float> path the reference's flat
    model never had)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            F.col("embedding")[0].cast("double").alias("first"),
            F.expr(
                "aggregate(embedding, 0D, (acc, x) -> acc + cast(x as double))"
            ).alias("sum_all"),
            F.expr(
                "size(filter(embedding, x -> x > 0))"
            ).cast("long").alias("n_positive"),
            F.expr(
                "aggregate(slice(embedding, 1, 8), 0D,"
                " (acc, x) -> acc + cast(abs(x) as double))"
            ).alias("l1_head8"),
        ).orderBy("vec_id")
    )


def q23_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q23 — conditional/NULL scalar family: CASE, coalesce, nullif,
    least/greatest."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 200000, "high")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.coalesce(
                F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")
            ).alias("status_or_open"),
            F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("capped"),
            F.greatest(F.col("o_totalprice") - 100000, F.lit(0.0)).alias(
                "excess"
            ),
        ).orderBy("o_orderkey")
    )


QUERIES = {
    "q1_filter_project": q1_filter_project,
    "q2_range_null_filter": q2_range_null_filter,
    "q3_broadcast_left_join": q3_broadcast_left_join,
    "q4_fact_left_join": q4_fact_left_join,
    "q5_unpivot": q5_unpivot,
    "q6_pivot_avg": q6_pivot_avg,
    "q7_lag": q7_lag,
    "q8_trailing_mean": q8_trailing_mean,
    "q9_lead": q9_lead,
    "q10_tail_distinct_min": q10_tail_distinct_min,
    "q11_union_all": q11_union_all,
    "q12_regex_concat": q12_regex_concat,
    "q13_time_features": q13_time_features,
    "q14_date_arith": q14_date_arith,
    "q15_label_encode": q15_label_encode,
    "q16_keyed_update": q16_keyed_update,
    "q17_feature_attach": q17_feature_attach,
    "q18_feature_pipeline": q18_feature_pipeline,
    "q19_rolling_multi": q19_rolling_multi,
    "q20_rank_functions": q20_rank_functions,
    "q21_string_functions": q21_string_functions,
    "q22_array_functions": q22_array_functions,
    "q23_conditional_functions": q23_conditional_functions,
}

ORACLES = {
    "q1_filter_project": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber
    """,
    "q2_range_null_filter": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
          AND o_totalprice IS NOT NULL
        ORDER BY o_orderkey
    """,
    "q3_broadcast_left_join": """
        SELECT c_custkey, n_name, r_name
        FROM customer
        LEFT JOIN nation ON c_nationkey = n_nationkey
        LEFT JOIN region ON n_regionkey = r_regionkey
        ORDER BY c_custkey
    """,
    "q4_fact_left_join": """
        SELECT l_orderkey, l_linenumber, o_orderdate, o_orderpriority
        FROM lineitem
        LEFT JOIN orders ON l_orderkey = o_orderkey
        ORDER BY l_orderkey, l_linenumber
    """,
    "q5_unpivot": """
        SELECT p_partkey, attr, val FROM (
            SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
            UNION ALL
            SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
        ) ORDER BY p_partkey, attr
    """,
    "q6_pivot_avg": """
        SELECT l_linestatus,
               avg(l_quantity) FILTER (WHERE l_returnflag = 'A') AS "A",
               avg(l_quantity) FILTER (WHERE l_returnflag = 'N') AS "N",
               avg(l_quantity) FILTER (WHERE l_returnflag = 'R') AS "R"
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "q7_lag": """
        SELECT event_id,
               lag(value, 7) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_7
        FROM events ORDER BY event_id
    """,
    "q8_trailing_mean": """
        SELECT event_id,
               CASE WHEN count(value) OVER w = 7 THEN avg(value) OVER w END AS roll_mean_7
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        ORDER BY event_id
    """,
    "q9_lead": """
        SELECT event_id,
               lead(value, 7) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lead_7
        FROM events ORDER BY event_id
    """,
    "q10_tail_distinct_min": """
        SELECT min(d) AS min_d FROM (
            SELECT DISTINCT o_orderdate AS d FROM orders ORDER BY d DESC LIMIT 20
        )
    """,
    "q11_union_all": """
        SELECT k, src FROM (
            SELECT o_orderkey AS k, 'hi' AS src FROM orders WHERE o_totalprice > 100000
            UNION ALL
            SELECT o_orderkey AS k, 'lo' AS src FROM orders WHERE o_totalprice <= 100000
        ) ORDER BY k, src
    """,
    "q12_regex_concat": """
        SELECT p_partkey,
               TRY_CAST(regexp_extract(p_name, '(\\d+)', 1) AS BIGINT) AS n,
               'F' || CAST(p_size AS VARCHAR) AS tag
        FROM part ORDER BY p_partkey
    """,
    "q13_time_features": """
        SELECT event_id,
               CAST(quarter(ts) AS BIGINT) AS q,
               CAST(weekofyear(ts) AS BIGINT) AS wk,
               CAST(isodow(ts) - 1 AS BIGINT) AS dow,
               CAST(CASE WHEN isodow(ts) - 1 IN (5, 6) THEN 1 ELSE 0 END AS BIGINT)
                   AS is_weekend
        FROM events ORDER BY event_id
    """,
    "q14_date_arith": """
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 28 DAY AS DATE) AS plus28,
               date_diff('day', (SELECT min(o_orderdate) FROM orders), o_orderdate)
                   + 1 AS day_idx
        FROM orders ORDER BY o_orderkey
    """,
    "q15_label_encode": """
        SELECT c_custkey,
               CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS BIGINT) AS code
        FROM customer ORDER BY c_custkey
    """,
    "q16_keyed_update": """
        SELECT c.c_custkey, c.c_name,
               coalesce(u.new_bal, c.c_acctbal) AS c_acctbal
        FROM customer c
        LEFT JOIN (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 6 = 0 THEN NULL
                        ELSE c_acctbal + 100.0 END AS new_bal
            FROM customer WHERE c_custkey % 3 = 0
        ) u USING (c_custkey)
        ORDER BY c_custkey
    """,
    "q17_feature_attach": """
        SELECT e.event_id, e.value, f.v7
        FROM events e
        LEFT JOIN (SELECT event_id, value * 7 AS v7 FROM events) f
          USING (event_id)
        ORDER BY event_id
    """,
    "q18_feature_pipeline": """
        WITH codes AS (
            SELECT event_type,
                   CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT)
                       AS event_type_code
            FROM (SELECT DISTINCT event_type FROM events)
        )
        SELECT event_id, user_id, value,
               lag(value, 1) OVER w AS value_lag_1,
               lag(value, 7) OVER w AS value_lag_7,
               CASE WHEN count(value) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) = 7
                    THEN avg(value) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               END AS value_roll_mean_7,
               lead(value, 7) OVER w AS value_lead_7,
               CAST(quarter(ts) AS BIGINT) AS q,
               CAST(isodow(ts) - 1 AS BIGINT) AS dow,
               CAST(CASE WHEN isodow(ts) - 1 IN (5, 6) THEN 1 ELSE 0 END
                    AS BIGINT) AS is_weekend,
               c.event_type_code
        FROM events JOIN codes c USING (event_type)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    "q22_array_functions": """
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first,
               list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))),
                   (acc, x) -> acc + x) AS sum_all,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)
                   AS n_positive,
               list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(embedding[1:8],
                       x -> CAST(abs(x) AS DOUBLE))),
                   (acc, x) -> acc + x) AS l1_head8
        FROM embeddings ORDER BY vec_id
    """,
    "q23_conditional_functions": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 200000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               coalesce(nullif(o_orderstatus, 'O'), 'open')
                   AS status_or_open,
               least(o_totalprice, 150000.0) AS capped,
               greatest(o_totalprice - 100000, 0.0) AS excess
        FROM orders ORDER BY o_orderkey
    """,
    "q20_rank_functions": """
        SELECT c_custkey, c_mktsegment,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               percent_rank() OVER w AS prnk,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               cume_dist() OVER w AS cdist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_custkey
    """,
    "q21_string_functions": """
        SELECT p_partkey,
               upper(p_brand) AS brand_u,
               lpad(p_type, 25, '.') AS type_pad,
               substring(p_name, 1, 8) AS name8,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
               split_part(p_type, ' ', 1) AS type_head,
               CAST(levenshtein(p_brand, p_type) AS BIGINT) AS edit_dist,
               CAST(length(p_name) AS BIGINT) AS name_len
        FROM part ORDER BY p_partkey
    """,
    "q19_rolling_multi": """
        SELECT event_id,
               CASE WHEN count(value) OVER w = 7
                    THEN sum(value) OVER w END AS roll_sum_7,
               CASE WHEN count(value) OVER w = 7
                    THEN min(value) OVER w END AS roll_min_7,
               CASE WHEN count(value) OVER w = 7
                    THEN max(value) OVER w END AS roll_max_7
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        ORDER BY event_id
    """,
}
