"""Round-10 queue — staged BEHIND the r9 head-50 (NOT registered in
``queries/__init__`` until the r9 driver window lands; the r9 head is
exactly full with the 8 r9b promotions + 42 re-bank picks). Locally
certified by ``tests/test_r10_queue.py`` running the same
Spark-vs-DuckDB differential as ``scripts/check_oracle.py``.

- x148 isotonic calibration (``operators/isotonic.py``): the PAV
  calibrator itself — the monotone score→rate map that x112's
  reliability table and x145's ECE only MEASURE — via the closed
  minimax form over bounded score bins (fully relational: one keyed
  shuffle + one bounded self-join + reversed-sort suffix-min window).
- x149 offline changepoint (``operators/changepoint.py``): per-series
  max-CUSUM localization of WHERE a completed daily series' mean
  shifted — the retrospective twin of the streaming CUSUM monitor
  (x101/s16); exact integer outputs, double only as selection order.
- x150 rank-biased overlap (``operators/rbo.py``): head-weighted
  ranking similarity between the exact (x9) and IVF (x23) top-10
  rankings — completes the ANN eval family (recall x116 counts set
  hits, nDCG x131 grades one ranking against truth, RBO compares the
  two ORDERINGS); all-integer via the lcm(1..10)·10^9 common
  denominator.
- s22 streaming-ECE batch twin (``streaming/ece_monitor.py``): the
  daily calibration trajectory at the monitor family's bounded-bin
  granularity, certifying the exact telescoped-integer kernel the
  update-mode deployment re-assembles through (the s21 twin pattern —
  AUC watches ranking quality, this watches score meaning).
- x151 ADIDA (``operators/adida.py``): the temporal-aggregation
  intermittent forecaster beside Croston (x139) — quarterly buckets
  with reconstructed zeros, integer SES, per-day ppm disaggregation.
- x152 forecastability features (``operators/forecastability.py``):
  VMR dispersion, day-of-week eta² seasonal strength, OLS trend —
  the method-selection triple beside SBC's demand quadrants.
- x153 Theil–Sen robust trend (``operators/theil_sen.py``): the
  ~29%-breakdown median-of-pairwise-slopes estimator OLS lacks —
  calendar-bounded keyed pair join, lower-median pick emits the
  exact rational.
- x154 SBC-routed method selection (``plans/method_select.py``):
  classify → route (Croston / weekly-ADIDA SES) → held-out µ-unit
  error vs the zero baseline, certified end-to-end over both demand
  families — the whole classical forecasting loop in one hash.
- x155 integer Lloyd k-means (``operators/kmeans.py``): the trained
  IVF codebook — fixed unrolled rounds from the certified seed rule,
  exact assignment/inertia/centroid checksums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.changepoint import (
    best_mean_shift,
)
from m5_competition_kaggle_spark.operators.isotonic import isotonic_fit
from m5_competition_kaggle_spark.operators.rbo import (
    _W_NUM,
    rbo_prefix,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

NS_PER_DAY = 86_400_000_000_000


def x148_isotonic_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PAV-fitted monotone purchase-rate map per user-cohort segment:
    score bins are least(round(value) DIV 10, 49) — a domain bounded
    at 50 bins BY CONSTRUCTION at any scale, so everything after the
    one keyed cell shuffle is constant-size."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("segment"),
        F.least(
            F.expr("CAST(round(value) AS BIGINT) DIV 10"), F.lit(49)
        ).alias("score_bin"),
        (F.col("event_type") == "purchase").alias("is_pos"),
    )
    return isotonic_fit(
        ev, ["segment"], "score_bin", "is_pos"
    ).orderBy("segment", "bin")


def x149_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single mean-shift split of each event type's daily COUNT
    series (counts keep every integer far inside the g² overflow
    contract) — where did this stream's volume regime change?"""
    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("t"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    return best_mean_shift(
        series, "event_type", "t", "y"
    ).orderBy("event_type")


def x150_rank_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBO(p=9/10, d=10) between the exact (x9) and IVF (x23) top-10
    rankings, per query — identical construction to x116/x131 (query
    set vec_id % 50 == 0, nprobe=4, 16 centroids) so all three eval
    metrics grade the SAME index run. A query with zero overlap still
    emits a row (rbo_ppm = 0); identical rankings cap at the
    truncated-prefix maximum 1 − p^10 = 651321 ppm (no extrapolation
    tail)."""
    from m5_competition_kaggle_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(emb, qset, k=10)
    ivf = ivf_topk(emb, qset, k=10, nprobe=4, n_centroids=16)
    per_q = rbo_prefix(exact, ivf, "query_id", "neighbor_id", "rank")
    qids = exact.select("query_id").distinct()
    return (
        qids.join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_matched", F.lit(0))
            .cast("long")
            .alias("n_matched"),
            F.coalesce("rbo_num", F.lit(0))
            .cast("long")
            .alias("rbo_num"),
            F.coalesce("rbo_ppm", F.lit(0))
            .cast("long")
            .alias("rbo_ppm"),
        )
        .orderBy("query_id")
    )


def s22_stream_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming daily-ECE monitor: per-day
    calibration of the capped permille score least(round(value·10),
    1000) against the purchase label, bin width 10 (≤101 bins of
    state per open day BY CONSTRUCTION), through the same telescoped
    exact-integer kernel the update-mode store re-assembles with."""
    from m5_competition_kaggle_spark.streaming.ece_monitor import (
        day_bin_stats,
        ece_day_table,
    )

    ev = load_table(spark, sf_dir, "events")
    cells = day_bin_stats(
        ev,
        score_expr=(
            "least(CAST(round(value * 10) AS BIGINT), 1000L)"
        ),
        bin_width=10,
    )
    return ece_day_table(cells).orderBy("day")


def x151_adida(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADIDA over the x139 part-demand construction with quarterly
    (91-day) buckets — the temporal-aggregation forecaster for the
    intermittent family Croston smooths directly. The bucket grid per
    part is calendar-span/91 bounded; zero buckets participate in the
    SES (the regularization is the method)."""
    from m5_competition_kaggle_spark.operators.adida import (
        adida_forecast,
    )

    US_PER_DAY = 86_400_000_000
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 20 == 0
    )
    demand = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.expr(f"unix_micros(l_shipdate) DIV {US_PER_DAY}").alias(
            "t"
        ),
    ).agg(
        F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)")).alias("q")
    )
    return adida_forecast(
        demand, "part", "t", "q", bucket_days=91, alpha_den=4
    ).orderBy("part")


def x152_forecastability(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forecastability triple (dispersion, dow seasonality strength,
    linear trend) of each event type's daily COUNT series — the
    method-selection features beside SBC's demand quadrants."""
    from m5_competition_kaggle_spark.operators.forecastability import (
        forecastability_features,
    )

    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("t"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    return forecastability_features(
        series, "event_type", "t", "y"
    ).orderBy("event_type")


def x153_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of each event type's daily permille-sum
    series — the breakdown-resistant companion to x152's OLS slope
    (one corrupted day cannot drag it). The pair set is calendar-
    bounded: days²/2 per event type."""
    from m5_competition_kaggle_spark.operators.theil_sen import (
        theil_sen_slope,
    )

    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("t"),
    ).agg(
        F.sum(
            F.expr("CAST(round(value * 1000) AS BIGINT)")
        ).alias("y")
    )
    return theil_sen_slope(
        series, "event_type", "t", "y"
    ).orderBy("event_type")


def x154_method_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SBC-routed forecasting over BOTH demand families
    (x141's construction): sparse part demand (horizon 182 days —
    the family's mean inter-demand gap is ~57 days, so a week would
    be empty) and dense user activity (horizon 7). Each series is
    classified, routed to Croston or weekly-ADIDA SES, and its
    held-out µ-unit error certified against the zero baseline —
    the whole method-selection loop in one hash."""
    from m5_competition_kaggle_spark.plans.method_select import (
        routed_forecast_eval,
    )

    US_PER_DAY = 86_400_000_000
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 20 == 0
    )
    part_demand = li.groupBy(
        F.col("l_partkey").alias("k"),
        F.expr(f"unix_micros(l_shipdate) DIV {US_PER_DAY}").alias(
            "t"
        ),
    ).agg(
        F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)")).alias("q")
    )
    ev = load_table(spark, sf_dir, "events")
    user_demand = ev.groupBy(
        F.col("user_id").alias("k"),
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("t"),
    ).agg(F.count(F.lit(1)).cast("long").alias("q"))
    parts = routed_forecast_eval(
        part_demand, "k", "t", "q", horizon=182
    ).select(F.lit("part").alias("family"), "*")
    users = routed_forecast_eval(
        user_demand, "k", "t", "q", horizon=7
    ).select(F.lit("user").alias("family"), "*")
    return parts.unionByName(users).orderBy("family", "k")


def x155_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd rounds from the certified IVF seed codebook over the
    embedding corpus (k=16) — trained-centroid cluster sizes, exact
    int64 inertia and centroid L1 checksums, the codebook the
    ivf_topk docstring promises a production build would train."""
    from m5_competition_kaggle_spark.operators.kmeans import (
        kmeans_lloyd,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd(emb, k=16, rounds=2).orderBy("cid")


QUERIES = {
    "x148_isotonic_calibration": x148_isotonic_calibration,
    "x149_changepoint": x149_changepoint,
    "x150_rank_rbo": x150_rank_rbo,
    "s22_stream_ece": s22_stream_ece,
    "x151_adida": x151_adida,
    "x152_forecastability": x152_forecastability,
    "x153_theil_sen": x153_theil_sen,
    "x154_method_select": x154_method_select,
    "x155_kmeans_lloyd": x155_kmeans_lloyd,
}

ORACLES: dict[str, str] = {}

ORACLES["x148_isotonic_calibration"] = """
WITH pts AS (
    SELECT user_id % 4 AS segment,
           least(CAST(round(value) AS BIGINT) // 10, 49) AS bin,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
),
cells AS (
    SELECT segment, bin,
           CAST(count(*) AS BIGINT) AS n_b,
           CAST(sum(pos) AS BIGINT) AS n_pos
    FROM pts GROUP BY 1, 2
),
cum AS (
    SELECT segment, bin, n_b, n_pos,
           CAST(sum(n_b) OVER w AS BIGINT) AS N,
           CAST(sum(n_pos) OVER w AS BIGINT) AS P
    FROM cells
    WINDOW w AS (PARTITION BY segment ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pairs AS (
    SELECT j.segment, j.bin AS jb, k.bin AS kb,
           CAST(k.P - (j.P - j.n_pos) AS DOUBLE)
               / CAST(k.N - (j.N - j.n_b) AS DOUBLE) AS seg_rate
    FROM cum j
    JOIN cum k ON j.segment = k.segment AND j.bin <= k.bin
),
m AS (
    SELECT segment, jb, kb AS ib,
           min(seg_rate) OVER (
               PARTITION BY segment, jb ORDER BY kb DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS min_rate
    FROM pairs
),
fit AS (
    SELECT segment, ib, max(min_rate) AS fitted_rate
    FROM m GROUP BY 1, 2
)
SELECT c.segment AS segment, c.bin AS bin, c.n_b AS n_b,
       c.n_pos AS n_pos,
       1000 * c.n_pos // c.n_b AS raw_permille,
       CAST(floor(1000 * f.fitted_rate) AS BIGINT)
           AS fitted_permille
FROM cells c
JOIN fit f ON f.segment = c.segment AND f.ib = c.bin
ORDER BY segment, bin
"""

ORACLES["x149_changepoint"] = """
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(count(*) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT event_type, t,
           CAST(row_number() OVER w AS BIGINT) AS i,
           CAST(sum(y) OVER (
               PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS S,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n,
           CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT)
               AS Sn
    FROM series
    WINDOW w AS (PARTITION BY event_type ORDER BY t)
),
splits AS (
    SELECT event_type, n, i AS cp_idx, t AS cp_t,
           n * S - i * Sn AS g,
           i * (n - i) AS den
    FROM cum WHERE i < n AND n >= 2
),
ranked AS (
    SELECT *,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(g * g AS DOUBLE) / CAST(den AS DOUBLE)
                        DESC, cp_idx ASC
           ) AS r
    FROM splits
)
SELECT event_type, n, cp_idx, cp_t,
       abs(g) AS g_abs, den,
       CASE WHEN g < 0 THEN 'up' WHEN g > 0 THEN 'down'
            ELSE 'flat' END AS direction
FROM ranked WHERE r = 1
ORDER BY event_type
"""

ORACLES["s22_stream_ece"] = """
WITH pts AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           least(CAST(round(value * 10) AS BIGINT), 1000) AS score,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events
),
cells AS (
    SELECT day, score - score % 10 AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS np,
           CAST(sum(score) AS BIGINT) AS ss
    FROM pts GROUP BY 1, 2
),
dev AS (
    SELECT day, n, abs(1000 * np - ss) AS d,
           abs(1000 * np - ss) // n AS dp
    FROM cells
)
SELECT day,
       CAST(sum(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(d) AS BIGINT) AS abs_dev_sum,
       1000 * CAST(sum(d) AS BIGINT) // CAST(sum(n) AS BIGINT)
           AS ece_ppm,
       CAST(max(dp) AS BIGINT) AS mce_permille
FROM dev GROUP BY day ORDER BY day
"""


ORACLES["x151_adida"] = """
WITH RECURSIVE demand AS (
    SELECT l_partkey AS part,
           epoch_ns(l_shipdate) // 86400000000000 AS t,
           CAST(sum(CAST(round(l_quantity) AS BIGINT))
                AS BIGINT) AS q
    FROM lineitem WHERE l_partkey % 20 = 0
    GROUP BY 1, 2
),
bsum AS (
    SELECT part, t // 91 AS b, CAST(sum(q) AS BIGINT) AS q
    FROM demand GROUP BY 1, 2
),
span AS (
    SELECT part, min(b) AS b0, max(b) AS b1,
           CAST(sum(CASE WHEN q <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nonzero
    FROM bsum GROUP BY part
),
grid AS (
    SELECT s.part, s.n_nonzero, u.b,
           row_number() OVER (PARTITION BY s.part ORDER BY u.b)
               AS idx
    FROM span s, unnest(generate_series(s.b0, s.b1)) AS u(b)
),
full_series AS (
    SELECT g.part, g.n_nonzero, g.idx,
           CAST(coalesce(m.q, 0) AS BIGINT) AS q
    FROM grid g
    LEFT JOIN bsum m ON m.part = g.part AND m.b = g.b
),
n_per AS (
    SELECT part, CAST(count(*) AS BIGINT) AS n_buckets
    FROM full_series GROUP BY part
),
rec AS (
    SELECT part, idx, q AS z FROM full_series WHERE idx = 1
    UNION ALL
    SELECT s.part, s.idx, r.z + (s.q - r.z) // 4
    FROM rec r
    JOIN full_series s ON s.part = r.part AND s.idx = r.idx + 1
)
SELECT n.part AS part, n.n_buckets AS n_buckets,
       f.n_nonzero AS n_nonzero,
       r.z AS agg_level,
       1000000 * r.z // 91 AS forecast_ppm
FROM n_per n
JOIN rec r ON r.part = n.part AND r.idx = n.n_buckets
JOIN (SELECT DISTINCT part, n_nonzero FROM full_series) f
  ON f.part = n.part
ORDER BY n.part
"""

ORACLES["x152_forecastability"] = """
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(count(*) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
cells AS (
    SELECT event_type, t % 7 AS dow,
           CAST(count(*) AS BIGINT) AS n_d,
           CAST(sum(y) AS BIGINT) AS s_d,
           CAST(sum(y * y) AS BIGINT) AS q_d,
           CAST(sum(t) AS BIGINT) AS st_d,
           CAST(sum(t * t) AS BIGINT) AS stt_d,
           CAST(sum(t * y) AS BIGINT) AS sty_d
    FROM series GROUP BY 1, 2
),
row_stats AS (
    SELECT event_type,
           {pivot},
           CAST(sum(n_d) AS BIGINT) AS n,
           CAST(sum(s_d) AS BIGINT) AS S,
           CAST(sum(q_d) AS BIGINT) AS Q,
           CAST(sum(st_d) AS BIGINT) AS St,
           CAST(sum(stt_d) AS BIGINT) AS Stt,
           CAST(sum(sty_d) AS BIGINT) AS Sty
    FROM cells GROUP BY event_type
)
SELECT event_type, n,
       CASE WHEN S > 0
            THEN 1000 * (n * Q - S * S) // (n * S)
       END AS vmr_permille,
       CASE WHEN n * Q - S * S > 0
                 AND (CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)
                      * CAST(S AS DOUBLE) / CAST(n AS DOUBLE)) > 0.0
            THEN CAST(floor(
           1000000.0 * (({ssb})
               - CAST(S AS DOUBLE) * CAST(S AS DOUBLE)
                 / CAST(n AS DOUBLE))
           / (CAST(Q AS DOUBLE) - CAST(S AS DOUBLE)
                 * CAST(S AS DOUBLE) / CAST(n AS DOUBLE))
       ) AS BIGINT) END AS eta2_dow_ppm,
       CASE WHEN n * Stt - St * St > 0
            THEN 1000000 * (n * Sty - St * S)
                 // (n * Stt - St * St)
       END AS trend_slope_ppm
FROM row_stats
ORDER BY event_type
""".format(
    pivot=",\n           ".join(
        f"CAST(sum(CASE WHEN dow = {d} THEN {c} ELSE 0 END) "
        f"AS BIGINT) AS {c[0]}_d{d}"
        for d in range(7)
        for c in ("n_d", "s_d")
    ),
    ssb=" + ".join(
        f"CASE WHEN n_d{d} > 0 THEN "
        f"CAST(s_d{d} AS DOUBLE) * CAST(s_d{d} AS DOUBLE) "
        f"/ CAST(n_d{d} AS DOUBLE) ELSE 0.0 END"
        for d in range(7)
    ),
)


ORACLES["x153_theil_sen"] = """
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(sum(CAST(round(value * 1000) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
pairs AS (
    SELECT a.event_type,
           a.t AS ti, b.t AS tj,
           b.y - a.y AS dy, b.t - a.t AS dx
    FROM series a
    JOIN series b ON a.event_type = b.event_type AND a.t < b.t
),
ranked AS (
    SELECT event_type, dy, dx,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) ASC,
                        ti ASC, tj ASC
           ) AS r,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_pairs
    FROM pairs
),
n_pts AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM series GROUP BY 1
)
SELECT p.event_type AS event_type, p.n AS n, r.n_pairs AS n_pairs,
       r.dy AS slope_num, r.dx AS slope_den,
       CASE WHEN r.dy >= 0 THEN 1000000 * r.dy // r.dx
            ELSE -((1000000 * (-r.dy)) // r.dx) END AS slope_ppm
FROM n_pts p
JOIN ranked r ON r.event_type = p.event_type
             AND r.r = (r.n_pairs + 1) // 2
ORDER BY p.event_type
"""


def _method_select_family_sql(
    family: str, demand_sql: str, horizon: int
) -> str:
    """One family's routed-forecast certification SQL: the x141 SBC
    arithmetic, the x139 Croston recursion and the x151 ADIDA(m=7)
    recursion over the TRAIN split, routed and scored on the held-out
    horizon — the same exact integers the Spark composition emits."""
    h = int(horizon)
    return f"""
SELECT * FROM (
WITH RECURSIVE demand AS MATERIALIZED ({demand_sql}),
cutoff AS (SELECT max(t) - {h} AS c FROM demand),
train AS MATERIALIZED (
    SELECT d.k, d.t, d.q FROM demand d, cutoff WHERE d.t <= cutoff.c
),
ev AS MATERIALIZED (
    SELECT d.k, d.q FROM demand d, cutoff WHERE d.t > cutoff.c
),
st AS (
    SELECT k, CAST(count(*) AS BIGINT) AS n_demands,
           max(t) - min(t) AS span,
           CAST(sum(q * q) AS BIGINT) AS sq2,
           CAST(sum(q) AS BIGINT) AS sq
    FROM train GROUP BY k HAVING count(*) >= 2
),
classes AS MATERIALIZED (
    SELECT k,
           CASE
             WHEN 100 * span >= 132 * (n_demands - 1)
                  AND 100 * (n_demands * sq2 - sq * sq) >= 49 * sq * sq
               THEN 'lumpy'
             WHEN 100 * span >= 132 * (n_demands - 1)
               THEN 'intermittent'
             WHEN 100 * (n_demands * sq2 - sq * sq) >= 49 * sq * sq
               THEN 'erratic'
             ELSE 'smooth'
           END AS sbc_class
    FROM st
),
indexed AS MATERIALIZED (
    SELECT k, t, q,
           row_number() OVER (PARTITION BY k ORDER BY t) AS idx
    FROM train
),
n_per AS (
    SELECT k, CAST(count(*) AS BIGINT) AS nd FROM indexed GROUP BY k
),
crec AS (
    SELECT k, idx, q AS z, CAST(-1 AS BIGINT) AS p, t AS pt
    FROM indexed WHERE idx = 1
    UNION ALL
    SELECT s.k, s.idx,
           r.z + (s.q - r.z) // 4,
           CASE WHEN r.p = -1 THEN s.t - r.pt
                ELSE r.p + ((s.t - r.pt) - r.p) // 4 END,
           s.t
    FROM crec r JOIN indexed s ON s.k = r.k AND s.idx = r.idx + 1
),
cro AS MATERIALIZED (
    SELECT n.k,
           CASE WHEN r.p >= 1 THEN 1000000 * r.z // r.p END AS f_cro
    FROM n_per n JOIN crec r ON r.k = n.k AND r.idx = n.nd
),
bsum AS MATERIALIZED (
    SELECT k, t // 7 AS b, CAST(sum(q) AS BIGINT) AS q
    FROM train GROUP BY 1, 2
),
span7 AS (SELECT k, min(b) AS b0, max(b) AS b1 FROM bsum GROUP BY k),
grid AS MATERIALIZED (
    SELECT s.k, u.b,
           row_number() OVER (PARTITION BY s.k ORDER BY u.b) AS idx
    FROM span7 s, unnest(generate_series(s.b0, s.b1)) AS u(b)
),
fs AS MATERIALIZED (
    SELECT g.k, g.idx, CAST(coalesce(m.q, 0) AS BIGINT) AS q
    FROM grid g LEFT JOIN bsum m ON m.k = g.k AND m.b = g.b
),
nb AS (
    SELECT k, CAST(count(*) AS BIGINT) AS n_buckets FROM fs GROUP BY k
),
arec AS (
    SELECT k, idx, q AS z FROM fs WHERE idx = 1
    UNION ALL
    SELECT s.k, s.idx, r.z + (s.q - r.z) // 4
    FROM arec r JOIN fs s ON s.k = r.k AND s.idx = r.idx + 1
),
ses AS MATERIALIZED (
    SELECT n.k, 1000000 * r.z // 7 AS f_ses
    FROM nb n JOIN arec r ON r.k = n.k AND r.idx = n.n_buckets
),
routed AS MATERIALIZED (
    SELECT c.k, c.sbc_class,
           CASE WHEN c.sbc_class IN ('intermittent', 'lumpy')
                THEN 'croston' ELSE 'adida_ses' END AS method,
           CASE WHEN c.sbc_class IN ('intermittent', 'lumpy')
                THEN cr.f_cro ELSE se.f_ses END AS f_ppm
    FROM classes c
    LEFT JOIN cro cr ON cr.k = c.k
    LEFT JOIN ses se ON se.k = c.k
),
evst AS (
    SELECT k, CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(q) AS BIGINT) AS q_eval
    FROM ev GROUP BY k
),
sae_pos AS (
    SELECT r.k,
           CAST(sum(abs(1000000 * e.q - r.f_ppm)) AS BIGINT) AS sp
    FROM routed r JOIN ev e ON e.k = r.k
    GROUP BY r.k
)
SELECT '{family}' AS family, r.k AS k, r.sbc_class AS sbc_class,
       r.method AS method, r.f_ppm AS f_ppm,
       coalesce(s.n_eval, 0) AS n_eval,
       coalesce(p.sp, 0)
           + ({h} - coalesce(s.n_eval, 0)) * r.f_ppm AS sae,
       1000000 * coalesce(s.q_eval, 0) AS sae_zero,
       CAST(coalesce(p.sp, 0)
                + ({h} - coalesce(s.n_eval, 0)) * r.f_ppm
            < 1000000 * coalesce(s.q_eval, 0) AS INT) AS beats_zero
FROM routed r
LEFT JOIN evst s ON s.k = r.k
LEFT JOIN sae_pos p ON p.k = r.k
) t_{family}
"""


_PART_DEMAND_SQL = """
    SELECT l_partkey AS k,
           epoch_ns(l_shipdate) // 86400000000000 AS t,
           CAST(sum(CAST(round(l_quantity) AS BIGINT))
                AS BIGINT) AS q
    FROM lineitem WHERE l_partkey % 20 = 0
    GROUP BY 1, 2
"""

_USER_DEMAND_SQL = """
    SELECT user_id AS k,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(count(*) AS BIGINT) AS q
    FROM events GROUP BY 1, 2
"""

ORACLES["x154_method_select"] = (
    _method_select_family_sql("part", _PART_DEMAND_SQL, 182)
    + "\nUNION ALL\n"
    + _method_select_family_sql("user", _USER_DEMAND_SQL, 7)
    + "\nORDER BY family, k"
)


def _kmeans_oracle(k: int, rounds: int) -> str:
    """Unrolled Lloyd rounds (the x41/x65 fixed-iteration precedent):
    each round is an exact int64 distance argmin (tie → lowest cid)
    and an integer-rounded per-dimension mean; empty clusters carry
    the previous centroid forward."""
    parts = [
        f"""
WITH q AS MATERIALIZED (
    SELECT vec_id AS vid,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
               AS v
    FROM embeddings
),
cent0 AS MATERIALIZED (
    SELECT vid AS cid, v AS cv FROM q WHERE vid < {k}
)"""
    ]
    prev = "cent0"
    for r in range(1, rounds + 1):
        parts.append(
            f""",
d{r} AS MATERIALIZED (
    SELECT q.vid, c.cid,
           CAST(sum((q.v[u.i] - c.cv[u.i])
                    * (q.v[u.i] - c.cv[u.i])) AS BIGINT) AS d2
    FROM q CROSS JOIN {prev} c,
         unnest(generate_series(1, len(q.v))) AS u(i)
    GROUP BY 1, 2
),
a{r} AS MATERIALIZED (
    SELECT vid, cid FROM (
        SELECT vid, cid,
               row_number() OVER (PARTITION BY vid
                                  ORDER BY d2 ASC, cid ASC) AS rn
        FROM d{r}
    ) WHERE rn = 1
),
s{r} AS MATERIALIZED (
    SELECT a.cid, u.i,
           CAST(sum(q.v[u.i]) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM a{r} a JOIN q ON q.vid = a.vid,
         unnest(generate_series(1, len(q.v))) AS u(i)
    GROUP BY 1, 2
),
cent{r} AS MATERIALIZED (
    SELECT cid, list(r ORDER BY i) AS cv FROM (
        SELECT cid, i,
               CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                    ELSE -((2 * (-s) + n) // (2 * n)) END AS r
        FROM s{r}
    ) GROUP BY cid
    UNION ALL
    SELECT c.cid, c.cv FROM {prev} c
    WHERE c.cid NOT IN (SELECT DISTINCT cid FROM s{r})
)"""
        )
        prev = f"cent{r}"
    parts.append(
        f""",
dfin AS MATERIALIZED (
    SELECT q.vid, c.cid,
           CAST(sum((q.v[u.i] - c.cv[u.i])
                    * (q.v[u.i] - c.cv[u.i])) AS BIGINT) AS d2
    FROM q CROSS JOIN {prev} c,
         unnest(generate_series(1, len(q.v))) AS u(i)
    GROUP BY 1, 2
),
afin AS (
    SELECT vid, cid, d2 FROM (
        SELECT vid, cid, d2,
               row_number() OVER (PARTITION BY vid
                                  ORDER BY d2 ASC, cid ASC) AS rn
        FROM dfin
    ) WHERE rn = 1
),
per_cluster AS (
    SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(d2) AS BIGINT) AS inertia
    FROM afin GROUP BY cid
),
checksum AS (
    SELECT c.cid, CAST(sum(abs(u.x)) AS BIGINT) AS centroid_l1
    FROM {prev} c, unnest(c.cv) AS u(x)
    GROUP BY c.cid
)
SELECT p.cid AS cid, p.n_vectors AS n_vectors,
       p.inertia AS inertia, s.centroid_l1 AS centroid_l1
FROM per_cluster p JOIN checksum s ON s.cid = p.cid
ORDER BY p.cid
"""
    )
    return "".join(parts)


ORACLES["x155_kmeans_lloyd"] = _kmeans_oracle(16, 2)


def _rbo_oracle() -> str:
    """Composes the certified x9 (exact) and x23 (IVF) oracle texts
    with the exact integer RBO weight ladder — the same compile-time
    W_num(m) integers the Spark side embeds."""
    from m5_competition_kaggle_spark.queries import (
        extensions,
        llm_curation,
    )

    exact_sql = extensions.ORACLES["x9_sim_topk"]
    ivf_sql = llm_curation.ORACLES["x23_sim_topk_ivf"]
    w_cases = " ".join(
        f"WHEN {m} THEN {num}" for m, num in _W_NUM.items()
    )
    return f"""
WITH exact AS MATERIALIZED (
    SELECT query_id, neighbor_id, "rank" AS ra
    FROM ({exact_sql}) t
),
ivf AS MATERIALIZED (
    SELECT query_id, neighbor_id, "rank" AS rb
    FROM ({ivf_sql}) t
),
matched AS (
    SELECT e.query_id, greatest(e.ra, i.rb) AS m
    FROM exact e
    JOIN ivf i ON e.query_id = i.query_id
              AND e.neighbor_id = i.neighbor_id
    WHERE e.ra <= 10 AND i.rb <= 10
),
perq AS (
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS n_matched,
           CAST(sum(CASE m {w_cases} ELSE 0 END) AS BIGINT)
               AS rbo_num
    FROM matched GROUP BY 1
),
qids AS (SELECT DISTINCT query_id FROM exact)
SELECT q.query_id AS query_id,
       coalesce(p.n_matched, 0) AS n_matched,
       coalesce(p.rbo_num, 0) AS rbo_num,
       coalesce(p.rbo_num, 0) // 25200000 AS rbo_ppm
FROM qids q
LEFT JOIN perq p ON q.query_id = p.query_id
ORDER BY query_id
"""


ORACLES["x150_rank_rbo"] = _rbo_oracle()
