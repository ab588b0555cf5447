"""Streaming-shaped queries over ``events``, batch-checked vs DuckDB.

Each runs the streaming plan builders (streaming/events.py) in batch mode;
the oracle reproduces the window semantics in plain SQL:

- tumbling(1h):   window_start = date_trunc('hour', ts)
- sliding(2h,1h): each event belongs to starts {trunc, trunc − 1h}
- session(30m):   gaps-and-islands (lag + cumulative flag sum), new session
  only when gap > 30min — an event exactly at prev + gap still merges
  (verified empirically: tests/test_streaming.py boundary test)
- running totals: plain cumulative window

The oracle casts DuckDB's TIMESTAMP_NS down to microseconds so gap
comparisons use the same precision Spark sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.events import (
    enrich_with_static,
    first_event_per_window,
    funnel_join,
    running_totals,
    session_aggregate,
    sliding_counts,
    tumbling_counts,
)


def s1_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev, "1 hour").orderBy("window_start", "event_type")


def s2_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_counts(ev, "2 hours", "1 hour").orderBy("window_start")


def s3_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_aggregate(ev, "30 minutes").orderBy(
        "user_id", "session_start"
    )


def s4_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return running_totals(ev).orderBy("event_id")


def s5_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful recurrence (not a SQL window): per-user EWMA via a
    JVM-side sort_array + aggregate() fold (grouped-map pandas variant in
    operators/stateful.py); oracle folds the same recursion with DuckDB
    ``list_reduce`` over the time-ordered value list."""
    from m5_competition_kaggle_spark.operators.stateful import ewma_per_key

    ev = load_table(spark, sf_dir, "events")
    return ewma_per_key(
        ev, "user_id", "value", ("ts_nanos", "event_id"), alpha=0.5
    ).orderBy("user_id")


def s6_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time dedup: first event per (user, type) per hour — the
    streaming-dropDuplicates-under-watermark shape, batch-checked."""
    ev = load_table(spark, sf_dir, "events")
    return first_event_per_window(ev).orderBy(
        "user_id", "event_type", "window_start"
    )


def s7_funnel_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join shape: purchases within 1h after a
    view by the same user (equi-key user_id + nanosecond range bound)."""
    ev = load_table(spark, sf_dir, "events")
    return funnel_join(ev).orderBy("user_id", "first_id", "next_id")


def s8_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join shape: events enriched with a per-type
    dimension (count + value-mass snapshot) and each event's deviation
    from its type mean. Streaming runs the identical plan with the
    static side re-broadcast per micro-batch (tests/test_streaming.py);
    this batch twin is the oracle-checked semantics.

    Certified surface is INTEGER-exact (r3 advice): ``value`` quantizes
    to micro-units via floor(value·1e6) — one IEEE multiply + floor,
    bit-identical in any engine, no round() half-way boundary — and the
    dimension carries (type_n, type_sum_micros) instead of a float avg
    whose partition-order-dependent summation could flip the value hash.
    ``delta_scaled`` = type_n·(value − mean) in micro-units, division-
    free. Consumers wanting the float mean derive it exactly as
    type_sum_micros / 1e6 / type_n."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_micros", F.floor(F.col("value") * F.lit(1e6)).cast("long")
    )
    dim = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_n"),
        F.sum("value_micros").alias("type_sum_micros"),
    )
    out = enrich_with_static(
        ev.select("event_id", "event_type", "value_micros"), dim
    )
    return out.select(
        "event_id",
        "event_type",
        "value_micros",
        "type_n",
        "type_sum_micros",
        (
            F.col("value_micros") * F.col("type_n")
            - F.col("type_sum_micros")
        ).alias("delta_scaled"),
    ).orderBy("event_id")


QUERIES = {
    "s1_tumbling": s1_tumbling,
    "s2_sliding": s2_sliding,
    "s3_session": s3_session,
    "s4_running_totals": s4_running_totals,
    "s5_ewma": s5_ewma,
    "s6_stream_dedup": s6_stream_dedup,
    "s7_funnel_join": s7_funnel_join,
    "s8_stream_static_enrich": s8_stream_static_enrich,
}

ORACLES = {
    "s1_tumbling": """
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type,
               count(*) AS n_events,
               sum(value) AS total_value
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "s2_sliding": """
        WITH starts AS (
            SELECT unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)),
                           date_trunc('hour', CAST(ts AS TIMESTAMP))
                               - INTERVAL 1 HOUR]) AS window_start,
                   value
            FROM events)
        SELECT window_start, count(*) AS n_events, sum(value) AS total_value
        FROM starts GROUP BY 1 ORDER BY 1
    """,
    "s3_session": """
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                          event_id
                   FROM events),
        flagged AS (
            SELECT *,
                   CASE WHEN ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                             OR lag(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT *,
                   sum(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS session_id
            FROM flagged)
        SELECT user_id, min(ts) AS session_start,
               count(*) AS n_events, sum(value) AS total_value
        FROM sessions GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    "s4_running_totals": """
        SELECT event_id, user_id,
               count(*) OVER w AS running_n,
               sum(value) OVER w AS running_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    "s5_ewma": """
        SELECT user_id,
               CAST(len(l) AS BIGINT) AS n_events,
               list_reduce(l, (acc, x) -> acc * 0.5 + x * 0.5) AS ewma
        FROM (SELECT user_id, list(value ORDER BY ts, event_id) AS l
              FROM events GROUP BY user_id)
        ORDER BY user_id
    """,
    "s6_stream_dedup": """
        WITH e AS (
            SELECT user_id, event_type, event_id, value,
                   CAST(ts AS TIMESTAMP) AS ts_us, epoch_ns(ts) AS tsn,
                   date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start
            FROM events),
        r AS (SELECT *,
                     row_number() OVER (
                         PARTITION BY user_id, event_type, window_start
                         ORDER BY tsn, event_id) AS rn
              FROM e)
        SELECT user_id, event_type, window_start, event_id,
               ts_us AS ts, value
        FROM r WHERE rn = 1
        ORDER BY user_id, event_type, window_start
    """,
    "s7_funnel_join": """
        WITH e AS (SELECT user_id, event_id, event_type,
                          epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
                   FROM events)
        SELECT a.user_id AS user_id, a.event_id AS first_id,
               b.event_id AS next_id, b.tsu - a.tsu AS delay_us
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND a.event_type = 'view' AND b.event_type = 'purchase'
         AND b.tsu >= a.tsu AND b.tsu <= a.tsu + 3600000000
        ORDER BY a.user_id, first_id, next_id
    """,
    "s8_stream_static_enrich": """
        WITH e AS (SELECT event_id, event_type,
                          CAST(floor(value * 1e6) AS BIGINT) AS value_micros
                   FROM events),
        dim AS (SELECT event_type,
                       count(*) AS type_n,
                       CAST(sum(value_micros) AS BIGINT) AS type_sum_micros
                FROM e GROUP BY event_type)
        SELECT e.event_id, e.event_type, e.value_micros,
               d.type_n, d.type_sum_micros,
               e.value_micros * d.type_n - d.type_sum_micros
                   AS delta_scaled
        FROM e LEFT JOIN dim d USING (event_type)
        ORDER BY e.event_id
    """,
}
