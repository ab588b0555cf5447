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


QUERIES = {
    "s1_tumbling": s1_tumbling,
    "s2_sliding": s2_sliding,
    "s3_session": s3_session,
    "s4_running_totals": s4_running_totals,
    "s5_ewma": s5_ewma,
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
}
