"""Round-9 queue, second batch — staged BEHIND the 50 r8 promotions
(NOT registered in ``queries/__init__`` until the r8 driver window
lands; registering now would push promotions past the head-50 cap).
Locally certified by ``tests/test_r9b_queue.py`` running the same
Spark-vs-DuckDB differential as ``scripts/check_oracle.py``.

- x141 SBC demand classification (``operators/intermittency.py``):
  the Syntetos-Boylan quadrants over TWO series families (sparse
  part-demand and dense user-activity) so all four classes carry
  mass — the method-selection front-end to Croston (x139).
- x142 simplified silhouette (``operators/silhouette.py``): cluster
  quality of the embeddings label partition against x39-style
  integer centroids — O(n·k), centroids broadcast.
- x143 scaled interval score (``operators/interval_score.py``):
  Winkler score + empirical coverage of the train-quantile central
  intervals — the M5 Uncertainty interval metric beside x140's SPL.
- x144 per-day ROC-AUC (``operators/auc.py``): Mann-Whitney AUC of
  the event value score against the purchase label, one keyed window
  over bounded score cells — never a global rank.
- s21 streaming-AUC batch twin (``streaming/auc_monitor.py``): the
  daily AUC trajectory at the monitor family's integer granularity,
  certifying the exact kernel the update-mode deployment re-assembles
  through (the s17/s18 twin pattern).
- x145 expected calibration error (``operators/ece.py``): the scalar
  monitor over x112's reliability binning — the per-bin deviation
  telescopes to exact integers, so ECE certifies with NO truncation
  (unlike the table's display quotients); plus the worst-bin MCE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.auc import group_auc
from m5_competition_kaggle_spark.operators.intermittency import (
    sbc_classes,
)
from m5_competition_kaggle_spark.operators.interval_score import (
    scaled_interval_score,
)
from m5_competition_kaggle_spark.operators.silhouette import (
    simplified_silhouette,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

NS_PER_DAY = 86_400_000_000_000
US_PER_DAY = 86_400_000_000


def x141_sbc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SBC quadrants over two demand families: per-part daily
    shipment demand (sparse → intermittent/lumpy) and per-user daily
    event activity (dense → smooth/erratic). Each family is one keyed
    aggregate + the sbc_classes aggregate; the union is bounded by
    key cardinality."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 20 == 0
    )
    part_demand = li.groupBy(
        F.col("l_partkey").alias("k"),
        F.expr(f"unix_micros(l_shipdate) DIV {US_PER_DAY}").alias("t"),
    ).agg(
        F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)")).alias("q")
    )
    ev = load_table(spark, sf_dir, "events")
    user_demand = ev.groupBy(
        F.col("user_id").alias("k"),
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("t"),
    ).agg(F.count(F.lit(1)).cast("long").alias("q"))
    parts = sbc_classes(part_demand, "k", "t", "q").select(
        F.lit("part").alias("family"), "*"
    )
    users = sbc_classes(user_demand, "k", "t", "q").select(
        F.lit("user").alias("family"), "*"
    )
    return parts.unionByName(users).orderBy("family", "k")


def x142_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette of the embeddings LABEL partition (10
    clusters at every SF) — how separated the labeled groups are in
    embedding space, per cluster."""
    emb = load_table(spark, sf_dir, "embeddings")
    return simplified_silhouette(
        emb, "vec_id", "label", "embedding"
    ).orderBy("cluster")


def x143_interval_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winkler interval score + coverage of the empirical central
    intervals on the per-event-type daily series (x140's series,
    same 7-day horizon), α ∈ {500, 200, 50} permille."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("t"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    return scaled_interval_score(
        spark, series, "event_type", "t", "y", horizon=7
    ).orderBy("event_type", "alpha")


def x144_day_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day ROC-AUC of the quantized event value as a purchase
    classifier — the daily model-quality monitor shape. Score cells
    bound the window input (distinct values per day), the day key
    partitions it."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("day"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("is_pos"),
    )
    return group_auc(ev, "day", "score", "is_pos").orderBy("day")


def s21_stream_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming daily-AUC monitor: the same
    day-score-class cells (integer score granularity) through the
    same auc_from_cells kernel the update-mode store re-assembles
    with — certifying the trajectory arithmetic the stream emits."""
    from m5_competition_kaggle_spark.streaming.auc_monitor import (
        auc_day_table,
        day_score_class_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    return auc_day_table(day_score_class_counts(ev)).orderBy("day")


def x145_calibration_ece(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ECE/MCE scalar over x112's exact setup (l_discount as the
    return-risk score vs observed l_returnflag = 'R', bin width 10
    permille) — the one-number calibration monitor beside the
    reliability table."""
    from m5_competition_kaggle_spark.operators.ece import (
        expected_calibration_error,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return expected_calibration_error(
        li,
        F.expr("CAST(round(l_discount * 1000) AS BIGINT)"),
        F.col("l_returnflag") == F.lit("R"),
        bin_width=10,
    )


def x146_demand_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-demand gap tails per sampled part (x139's demand
    construction): max/p50/p90 dry spell and review-period breaches
    (threshold 30 days) — the replenishment-risk companion to SBC's
    mean-interval view."""
    from m5_competition_kaggle_spark.operators.demand_gaps import (
        demand_gap_stats,
    )

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 20 == 0
    )
    demand = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.expr(f"unix_micros(l_shipdate) DIV {US_PER_DAY}").alias("t"),
    ).agg(F.count(F.lit(1)).alias("__n"))
    return demand_gap_stats(
        demand, "part", "t", over_threshold=30
    ).orderBy("part")


def x147_tracking_signal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tracking signal of the seasonal-naive (lag-7) forecaster on
    the per-event-type daily series — is the weekly-naive baseline
    systematically high or low per series? One per-series lag window
    builds the forecast; the operator is one keyed aggregate."""
    from pyspark.sql.window import Window

    from m5_competition_kaggle_spark.operators.tracking_signal import (
        tracking_signal,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("t"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("t")
    pairs = series.withColumn("yhat", F.lag("y", 7).over(w))
    return tracking_signal(
        pairs, "event_type", "y", "yhat"
    ).orderBy("event_type")


QUERIES = {
    "x141_sbc_classes": x141_sbc_classes,
    "x142_silhouette": x142_silhouette,
    "x143_interval_score": x143_interval_score,
    "x144_day_auc": x144_day_auc,
    "s21_stream_auc": s21_stream_auc,
    "x145_calibration_ece": x145_calibration_ece,
    "x146_demand_gaps": x146_demand_gaps,
    "x147_tracking_signal": x147_tracking_signal,
}

ORACLES: dict[str, str] = {}

ORACLES["x141_sbc_classes"] = """
WITH part_demand AS (
    SELECT l_partkey AS k,
           epoch_ns(l_shipdate) // 86400000000000 AS t,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
    FROM lineitem WHERE l_partkey % 20 = 0 GROUP BY 1, 2
),
user_demand AS (
    SELECT user_id AS k,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(count(*) AS BIGINT) AS q
    FROM events GROUP BY 1, 2
),
demand AS (
    SELECT 'part' AS family, * FROM part_demand
    UNION ALL
    SELECT 'user' AS family, * FROM user_demand
),
st AS (
    SELECT family, k,
           CAST(count(*) AS BIGINT) AS n_demands,
           max(t) - min(t) AS span,
           CAST(sum(q * q) AS BIGINT) AS sq2,
           CAST(sum(q) AS BIGINT) AS sq
    FROM demand GROUP BY 1, 2
    HAVING count(*) >= 2
)
SELECT family, k, n_demands,
       100 * span // (n_demands - 1) AS adi_x100,
       100 * (n_demands * sq2 - sq * sq) // (sq * sq) AS cv2_x100,
       CASE
         WHEN 100 * span >= 132 * (n_demands - 1)
              AND 100 * (n_demands * sq2 - sq * sq) >= 49 * sq * sq
           THEN 'lumpy'
         WHEN 100 * span >= 132 * (n_demands - 1) THEN 'intermittent'
         WHEN 100 * (n_demands * sq2 - sq * sq) >= 49 * sq * sq
           THEN 'erratic'
         ELSE 'smooth'
       END AS sbc_class
FROM st
ORDER BY family, k
"""

ORACLES["x142_silhouette"] = """
WITH q AS (
    SELECT vec_id, label,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
               AS v
    FROM embeddings
),
comp AS (
    SELECT label AS c, i, CAST(sum(v[i]) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM q, unnest(generate_series(1, len(v))) AS u(i)
    GROUP BY 1, 2
),
cent AS (
    SELECT c, i,
           CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                ELSE -((2 * (-s) + n) // (2 * n)) END AS r
    FROM comp
),
dists AS (
    SELECT q.vec_id, q.label, ce.c,
           CAST(sum((v[ce.i] - ce.r) * (v[ce.i] - ce.r)) AS BIGINT)
               AS dd
    FROM q CROSS JOIN cent ce
    GROUP BY 1, 2, 3
),
ab AS (
    SELECT vec_id, label,
           CAST(floor(sqrt(CAST(
               max(CASE WHEN c = label THEN dd END) AS DOUBLE)))
               AS BIGINT) AS a,
           CAST(floor(sqrt(CAST(
               min(CASE WHEN c <> label THEN dd END) AS DOUBLE)))
               AS BIGINT) AS b
    FROM dists GROUP BY 1, 2
),
s AS (
    SELECT label,
           CASE WHEN greatest(a, b) > 0
                THEN 1000000 * (b - a) // greatest(a, b)
                ELSE 0 END AS s_ppm
    FROM ab
)
SELECT label AS cluster,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(s_ppm) AS BIGINT) AS s_ppm_sum,
       CAST(sum(s_ppm) AS BIGINT) // count(*) AS mean_s_ppm
FROM s GROUP BY 1 ORDER BY 1
"""

ORACLES["x143_interval_score"] = """
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
alphas AS (
    SELECT CAST(a AS BIGINT) AS alpha
    FROM (VALUES (500), (200), (50)) AS v(a)
),
bounds AS (
    SELECT t.event_type, al.alpha, t.n_train, t.scale_num, t.n_diff,
           lo.y AS lo, hi.y AS hi
    FROM tr_stats t
    CROSS JOIN alphas al
    JOIN ranked lo ON lo.event_type = t.event_type
        AND lo.rn = ((al.alpha // 2) * t.n_train + 999) // 1000
    JOIN ranked hi ON hi.event_type = t.event_type
        AND hi.rn = ((1000 - al.alpha // 2) * t.n_train + 999) // 1000
),
scored AS (
    SELECT b.event_type, b.alpha, b.n_train, b.scale_num, b.n_diff,
           b.lo, b.hi,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN e.y >= b.lo AND e.y <= b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
           CAST(sum(b.alpha * (b.hi - b.lo)
                    + 2000 * greatest(b.lo - e.y, 0)
                    + 2000 * greatest(e.y - b.hi, 0))
                AS BIGINT) AS w_sum
    FROM ev e
    JOIN bounds b ON b.event_type = e.event_type
    GROUP BY 1, 2, 3, 4, 5, 6, 7
)
SELECT event_type, alpha, n_train, n_eval, lo, hi, n_in,
       1000 * n_in // n_eval AS cover_permille,
       w_sum, scale_num, n_diff,
       CASE WHEN scale_num > 0 AND n_eval > 0
            THEN 1000 * w_sum * n_diff
                 // (alpha * n_eval * scale_num)
       END AS sis_ppk
FROM scored
ORDER BY event_type, alpha
"""

ORACLES["s21_stream_auc"] = """
WITH cells AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(round(value) AS BIGINT) AS score,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT) AS np,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN 0 ELSE 1 END) AS BIGINT) AS nn
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT day, np, nn,
           CAST(coalesce(sum(nn) OVER (
               PARTITION BY day ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS cumneg
    FROM cells
),
agg AS (
    SELECT day,
           CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           CAST(count(*) AS BIGINT) AS n_scores,
           CAST(sum(2 * np * cumneg + np * nn) AS BIGINT) AS u2
    FROM cum GROUP BY 1
)
SELECT day, n_pos, n_neg, n_scores,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN 1000000 * u2 // (2 * n_pos * n_neg)
       END AS auc_ppm
FROM agg ORDER BY day
"""

ORACLES["x145_calibration_ece"] = """
WITH binned AS (
    SELECT CAST(round(l_discount * 1000) AS BIGINT) AS score,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
    FROM lineitem
),
bins AS (
    SELECT score // 10 AS bin,
           CAST(count(*) AS BIGINT) AS n_b,
           CAST(sum(pos) AS BIGINT) AS np,
           CAST(sum(score) AS BIGINT) AS ss
    FROM binned GROUP BY 1
),
dev AS (
    SELECT bin, n_b, abs(1000 * np - ss) AS d,
           abs(1000 * np - ss) // n_b AS d_permille
    FROM bins
)
SELECT CAST(sum(n_b) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(d) AS BIGINT) AS abs_dev_sum,
       1000 * CAST(sum(d) AS BIGINT) // CAST(sum(n_b) AS BIGINT)
           AS ece_ppm,
       CAST(max(d_permille) AS BIGINT) AS mce_permille,
       CAST((SELECT min(bin) FROM dev d2
             WHERE d2.d_permille = (SELECT max(d_permille) FROM dev))
            AS BIGINT) AS mce_bin
FROM dev
"""

ORACLES["x146_demand_gaps"] = """
WITH demand AS (
    SELECT l_partkey AS part,
           epoch_ns(l_shipdate) // 86400000000000 AS t
    FROM lineitem WHERE l_partkey % 20 = 0
    GROUP BY 1, 2
),
gaps AS (
    SELECT part,
           t - lag(t) OVER (PARTITION BY part ORDER BY t) AS g
    FROM demand
    QUALIFY g IS NOT NULL
),
agg AS (
    SELECT part,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(max(g) AS BIGINT) AS max_gap,
           CAST(sum(CASE WHEN g > 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_over,
           list_sort(list(g)) AS arr
    FROM gaps GROUP BY 1
)
SELECT part, n_gaps, max_gap,
       CAST(arr[(500 * n_gaps + 999) // 1000] AS BIGINT) AS p50_gap,
       CAST(arr[(900 * n_gaps + 999) // 1000] AS BIGINT) AS p90_gap,
       n_over
FROM agg ORDER BY part
"""

ORACLES["x147_tracking_signal"] = """
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(sum(CAST(round(value * 1000) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
pairs AS (
    SELECT event_type, y,
           lag(y, 7) OVER (PARTITION BY event_type ORDER BY t)
               AS yhat
    FROM series
    QUALIFY yhat IS NOT NULL
),
agg AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y - yhat) AS BIGINT) AS err_sum,
           CAST(sum(abs(y - yhat)) AS BIGINT) AS abs_err_sum
    FROM pairs GROUP BY 1
)
SELECT event_type, n, err_sum, abs_err_sum,
       CASE WHEN abs_err_sum > 0
            THEN 1000 * err_sum // abs_err_sum END AS bias_permille,
       CASE WHEN abs_err_sum > 0
            THEN 100 * err_sum * n // abs_err_sum END AS ts_x100
FROM agg ORDER BY event_type
"""

ORACLES["x144_day_auc"] = """
WITH pts AS (
    SELECT epoch_ns(ts) // 86400000000000 AS day,
           CAST(round(value * 1000) AS BIGINT) AS score,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS is_pos
    FROM events
),
cells AS (
    SELECT day, score,
           CAST(sum(is_pos) AS BIGINT) AS np,
           CAST(sum(1 - is_pos) AS BIGINT) AS nn
    FROM pts GROUP BY 1, 2
),
cum AS (
    SELECT day, np, nn,
           CAST(coalesce(sum(nn) OVER (
               PARTITION BY day ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS cumneg
    FROM cells
),
agg AS (
    SELECT day,
           CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           CAST(count(*) AS BIGINT) AS n_scores,
           CAST(sum(2 * np * cumneg + np * nn) AS BIGINT) AS u2
    FROM cum GROUP BY 1
)
SELECT day, n_pos, n_neg, n_scores,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN 1000000 * u2 // (2 * n_pos * n_neg)
       END AS auc_ppm
FROM agg ORDER BY day
"""
