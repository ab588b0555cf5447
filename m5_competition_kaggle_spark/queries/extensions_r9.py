"""Round-9 queue, first batch — the forecasting half the reference's
competition context still owed after x138 closed the Accuracy track:

- x139 Croston intermittent-demand forecast (``operators/croston.py``):
  the classical per-series baseline for the sparse item-day demand
  that dominates the M5 corpus — integer SES over nonzero demand
  sizes and inter-demand intervals on the per-part daily-quantity
  series (TPC-H parts sell rarely: median inter-demand gap ~57 days
  at sf0.01 — genuinely intermittent, audited non-vacuous).
- x140 scaled pinball loss (``operators/pinball.py``): the M5
  UNCERTAINTY track's metric (SPL) of the empirical-train-quantile
  forecaster on the per-event-type daily series over a 7-day held-out
  horizon — RMSSE's (x138) quantile-forecast companion, all-integer.

Registered BEHIND the 48 r8 promotions; these take the window's last
two slots (48 + 2 = 50 exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.croston import (
    croston_forecast,
)
from m5_competition_kaggle_spark.operators.pinball import (
    scaled_pinball_loss,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

NS_PER_DAY = 86_400_000_000_000
US_PER_DAY = 86_400_000_000


def x139_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston forecast per sampled part over its nonzero daily
    demand (sum of rounded quantities per ship-day). The demand table
    is one keyed aggregate off the scan (the part filter pushes
    down); the fold is JVM-side per key — no calendar grid, no
    Python. α = 1/4 on both the size and interval levels."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 20 == 0
    )
    demand = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.expr(
            f"unix_micros(l_shipdate) DIV {US_PER_DAY}"
        ).alias("t"),
    ).agg(
        F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)")).alias("q")
    )
    return croston_forecast(
        demand, "part", "t", "q", alpha_den=4
    ).orderBy("part")


def x140_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaled pinball loss (M5 Uncertainty's SPL, ppm) of the
    empirical train-quantile forecaster at u ∈ {500, 750, 900, 975}
    permille on the per-event-type daily series (x138's series
    construction), horizon = last 7 days. One train-side rank window
    per series, broadcast level table, keyed everything else."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("t"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    return scaled_pinball_loss(
        spark, series, "event_type", "t", "y", horizon=7
    ).orderBy("event_type", "u")


QUERIES = {
    "x139_croston": x139_croston,
    "x140_pinball": x140_pinball,
}

ORACLES: dict[str, str] = {}

ORACLES["x139_croston"] = """
WITH RECURSIVE demand AS (
    SELECT l_partkey AS part,
           epoch_ns(l_shipdate) // 86400000000000 AS t,
           CAST(sum(CAST(round(l_quantity) AS BIGINT))
                AS BIGINT) AS q
    FROM lineitem WHERE l_partkey % 20 = 0
    GROUP BY 1, 2
),
indexed AS (
    SELECT part, t, q,
           row_number() OVER (PARTITION BY part ORDER BY t) AS idx
    FROM demand
),
n_per AS (
    SELECT part, CAST(count(*) AS BIGINT) AS n_demands
    FROM indexed GROUP BY part
),
rec AS (
    SELECT part, idx, q AS z, CAST(-1 AS BIGINT) AS p, t AS pt
    FROM indexed WHERE idx = 1
    UNION ALL
    SELECT s.part, s.idx,
           r.z + (s.q - r.z) // 4,
           CASE WHEN r.p = -1 THEN s.t - r.pt
                ELSE r.p + ((s.t - r.pt) - r.p) // 4 END,
           s.t
    FROM rec r
    JOIN indexed s ON s.part = r.part AND s.idx = r.idx + 1
)
SELECT n.part, n.n_demands, r.z AS size_level,
       CASE WHEN r.p >= 1 THEN r.p END AS interval_level,
       CASE WHEN r.p >= 1 THEN 1000000 * r.z // r.p END
           AS forecast_ppm
FROM n_per n
JOIN rec r ON r.part = n.part AND r.idx = n.n_demands
ORDER BY n.part
"""

ORACLES["x140_pinball"] = """
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(sum(CAST(round(value * 1000) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
cut AS (SELECT max(t) - 7 AS c FROM series),
train AS (
    SELECT s.* FROM series s, cut WHERE s.t <= cut.c
),
ev AS (
    SELECT s.* FROM series s, cut WHERE s.t > cut.c
),
ranked AS (
    SELECT event_type, y,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY y, t) AS rn
    FROM train
),
tr_stats AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(sum(ad) AS BIGINT) AS scale_num,
           CAST(count(ad) AS BIGINT) AS n_diff
    FROM (
        SELECT event_type,
               abs(y - lag(y) OVER (PARTITION BY event_type
                                    ORDER BY t)) AS ad
        FROM train
    ) GROUP BY event_type
),
levels AS (
    SELECT CAST(u AS BIGINT) AS u
    FROM (VALUES (500), (750), (900), (975)) AS v(u)
),
fcst AS (
    SELECT t.event_type, l.u, t.n_train, t.scale_num, t.n_diff,
           r.y AS fcst
    FROM tr_stats t
    CROSS JOIN levels l
    JOIN ranked r ON r.event_type = t.event_type
                 AND r.rn = (l.u * t.n_train + 999) // 1000
),
pin AS (
    SELECT f.event_type, f.u, f.n_train, f.scale_num, f.n_diff,
           f.fcst,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN e.y >= f.fcst
                         THEN f.u * (e.y - f.fcst)
                         ELSE (1000 - f.u) * (f.fcst - e.y)
                    END) AS BIGINT) AS pin_sum
    FROM ev e
    JOIN fcst f ON f.event_type = e.event_type
    GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT event_type, u, n_train, n_eval, fcst, pin_sum, scale_num,
       n_diff,
       CASE WHEN scale_num > 0 AND n_eval > 0
            THEN 1000 * pin_sum * n_diff // (n_eval * scale_num)
       END AS spl_ppm
FROM pin
ORDER BY event_type, u
"""
