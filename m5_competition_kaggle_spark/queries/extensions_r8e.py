"""Round-8 queue, fifth batch — weighted-estimate and split
diagnostics: the certificates a training-data pipeline checks before
trusting its own numbers.

Registered BEHIND the r7 window; these certify locally this round and
join the r8 promotion queue.

- x126 importance-weight ESS (``operators/ess.py``): effective sample
  size of length-bucket-balancing weights per language — the "is the
  reweighted estimate real" diagnostic for x27/x35-style weighting.
- x127 conformal threshold (``operators/conformal.py``): split-
  conformal calibration with the exact finite-sample rank
  k = ceil((n+1)(1-α)), threshold as an order statistic, achieved
  coverage as integer permille.
- x128 split balance (``operators/balance.py``): per-language χ² of
  the hash train/test split — the bias companion of x98's leakage
  certificate, integers + a fixed-shape double tree.
- x129 Poisson-bootstrap CI (``operators/bootstrap.py``): derandomized
  Poisson(1) bootstrap (md5-h64 permille CDF draws) of the mean order
  value per market segment; the ~80% interval as order statistics of
  16 exact replica floor-means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.text import h64
from m5_competition_kaggle_spark.operators.balance import (
    split_balance,
)
from m5_competition_kaggle_spark.operators.bootstrap import (
    poisson_bootstrap_ci,
)
from m5_competition_kaggle_spark.operators.conformal import (
    conformal_threshold,
)
from m5_competition_kaggle_spark.operators.ess import ess_by_group
from m5_competition_kaggle_spark.sources.catalog import load_table

H64_SQL = "CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"


def x126_importance_ess(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ESS per language of LENGTH-balancing importance weights
    w = (1000·N) DIV (B·n_bucket) over 100-char length buckets — the
    weight that equalizes length-bucket mass (rare very-short/very-
    long docs get upweighted, so the weights genuinely vary; the
    fixture's SOURCES are deliberately uniform and would certify a
    vacuous ESS = 1000‰). Exact (Σw)², Σw² integers plus floor
    permille of ESS/n."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.expr("n_chars DIV 100").alias("b")
    )
    bn = docs.groupBy("b").agg(F.count(F.lit(1)).alias("n_b"))
    tot = docs.agg(
        F.count(F.lit(1)).alias("__N"),
        F.countDistinct("b").alias("__B"),
    )
    weighted = (
        docs.join(F.broadcast(bn), "b")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "w", F.expr("(1000 * __N) DIV (__B * n_b)")
        )
    )
    return ess_by_group(weighted, ["lang"], "w").orderBy("lang")


def x127_conformal_threshold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal calibration of the quantized event value per
    event type at α = 1/10: k = ceil((n+1)·9/10), q_hat = k-th
    smallest score, achieved coverage in permille."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    return conformal_threshold(
        ev, ["event_type"], "q", 1, 10
    ).orderBy("event_type")


def x128_split_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language balance certificate of the deterministic 80/20
    hash split (h64(doc_id) % 10 < 8): observed train/test counts,
    permille shares vs the global share, and the χ² contribution."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )
    train = (
        F.pmod(h64(F.col("doc_id").cast("string")), F.lit(10)) < 8
    )
    return split_balance(docs, ["lang"], train).orderBy("lang")


def x129_bootstrap_ci(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Derandomized Poisson-bootstrap ~80% interval (replica ranks
    2 and 15 of 16) of the mean order value in cents per market
    segment — deterministic error bars over the same join as x121."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT)"
        ).alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).select("o_orderkey", "c_mktsegment", "cents")
    return poisson_bootstrap_ci(
        joined, ["c_mktsegment"], "cents", "o_orderkey",
        b=16, lo_rank=2, hi_rank=15,
    ).orderBy("c_mktsegment")


QUERIES = {
    "x126_importance_ess": x126_importance_ess,
    "x127_conformal_threshold": x127_conformal_threshold,
    "x128_split_balance": x128_split_balance,
    "x129_bootstrap_ci": x129_bootstrap_ci,
}

ORACLES: dict[str, str] = {}

ORACLES["x126_importance_ess"] = """
WITH buckets AS (
    SELECT lang, n_chars // 100 AS b FROM documents
),
bn AS (
    SELECT b, CAST(count(*) AS BIGINT) AS n_b
    FROM buckets GROUP BY b
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n_all,
           CAST(count(DISTINCT b) AS BIGINT) AS n_bkt
    FROM buckets
),
wdocs AS (
    SELECT d.lang, (1000 * t.n_all) // (t.n_bkt * s.n_b) AS w
    FROM buckets d
    JOIN bn s ON d.b = s.b
    CROSS JOIN tot t
),
agg AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(w) AS BIGINT) AS sum_w,
           CAST(sum(w * w) AS BIGINT) AS sum_w2
    FROM wdocs GROUP BY lang
)
SELECT lang, n, sum_w, sum_w2,
       sum_w * sum_w AS ess_num,
       sum_w2 AS ess_den,
       CASE WHEN sum_w2 > 0 AND n > 0
            THEN (1000 * sum_w * sum_w) // (sum_w2 * n)
       END AS ess_permille
FROM agg
ORDER BY lang
"""

ORACLES["x127_conformal_threshold"] = """
WITH s AS (
    SELECT event_type,
           CAST(round(value * 1000) AS BIGINT) AS q
    FROM events
),
ranked AS (
    SELECT event_type, q,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY q) AS rn
    FROM s
),
th AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           ((count(*) + 1) * 9 + 9) // 10 AS k
    FROM s GROUP BY event_type
),
qh AS (
    SELECT r.event_type, r.q AS q_hat
    FROM ranked r JOIN th ON r.event_type = th.event_type
                         AND r.rn = th.k
),
cov AS (
    SELECT s.event_type,
           CAST(sum(CASE WHEN s.q <= qh.q_hat THEN 1 ELSE 0 END)
                AS BIGINT) AS cov_count
    FROM s JOIN qh ON s.event_type = qh.event_type
    GROUP BY s.event_type
)
SELECT th.event_type, th.n, CAST(th.k AS BIGINT) AS k, qh.q_hat,
       cov.cov_count,
       (1000 * cov.cov_count) // th.n AS cov_permille
FROM th
LEFT JOIN qh ON th.event_type = qh.event_type
LEFT JOIN cov ON th.event_type = cov.event_type
ORDER BY th.event_type
"""

_H64_DOC = H64_SQL.format(s="CAST(doc_id AS VARCHAR)")

ORACLES["x128_split_balance"] = f"""
WITH cells AS (
    SELECT lang,
           CAST(sum(CASE WHEN {_H64_DOC} % 10 < 8
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN {_H64_DOC} % 10 < 8
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_test
    FROM documents GROUP BY lang
),
margins AS (
    SELECT CAST(sum(n_train) AS BIGINT) AS t_train,
           CAST(sum(n_test) AS BIGINT) AS t_test
    FROM cells
)
SELECT c.lang, c.n_train, c.n_test,
       c.n_train + c.n_test AS n_row,
       (1000 * c.n_train) // (c.n_train + c.n_test)
           AS train_permille,
       (1000 * m.t_train) // (m.t_train + m.t_test)
           AS global_train_permille,
       CASE WHEN m.t_train > 0 AND m.t_test > 0
                 AND c.n_train + c.n_test > 0 THEN
         (CAST(c.n_train AS DOUBLE)
          - CAST(c.n_train + c.n_test AS DOUBLE)
            * CAST(m.t_train AS DOUBLE)
            / CAST(m.t_train + m.t_test AS DOUBLE))
         * (CAST(c.n_train AS DOUBLE)
            - CAST(c.n_train + c.n_test AS DOUBLE)
              * CAST(m.t_train AS DOUBLE)
              / CAST(m.t_train + m.t_test AS DOUBLE))
         / (CAST(c.n_train + c.n_test AS DOUBLE)
            * CAST(m.t_train AS DOUBLE)
            / CAST(m.t_train + m.t_test AS DOUBLE))
         +
         (CAST(c.n_test AS DOUBLE)
          - CAST(c.n_train + c.n_test AS DOUBLE)
            * CAST(m.t_test AS DOUBLE)
            / CAST(m.t_train + m.t_test AS DOUBLE))
         * (CAST(c.n_test AS DOUBLE)
            - CAST(c.n_train + c.n_test AS DOUBLE)
              * CAST(m.t_test AS DOUBLE)
              / CAST(m.t_train + m.t_test AS DOUBLE))
         / (CAST(c.n_train + c.n_test AS DOUBLE)
            * CAST(m.t_test AS DOUBLE)
            / CAST(m.t_train + m.t_test AS DOUBLE))
       END AS chi2
FROM cells c CROSS JOIN margins m
ORDER BY c.lang
"""

_H64_REP = H64_SQL.format(
    s="CAST(o_orderkey AS VARCHAR) || '_' || CAST(b AS VARCHAR)"
)

ORACLES["x129_bootstrap_ci"] = f"""
WITH joined AS (
    SELECT o.o_orderkey, c.c_mktsegment,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
reps AS (SELECT unnest(range(0, 16)) AS b),
fanned AS (
    SELECT j.c_mktsegment, j.cents,
           r.b, {_H64_REP} % 1000 AS u
    FROM joined j CROSS JOIN reps r
),
weighted AS (
    SELECT c_mktsegment, b, cents,
           CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1
                WHEN u < 920 THEN 2 WHEN u < 981 THEN 3
                WHEN u < 996 THEN 4 WHEN u < 999 THEN 5
                ELSE 6 END AS w
    FROM fanned
),
rep_means AS (
    SELECT c_mktsegment, b,
           CAST(sum(w * cents) AS BIGINT)
               // CAST(sum(w) AS BIGINT) AS mean_q
    FROM weighted GROUP BY c_mktsegment, b
    HAVING sum(w) > 0
),
ranked AS (
    SELECT c_mktsegment, mean_q, b,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY mean_q, b) AS rn
    FROM rep_means
),
ci AS (
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_reps,
           max(CASE WHEN rn = 2 THEN mean_q END) AS ci_lo_q,
           max(CASE WHEN rn = 15 THEN mean_q END) AS ci_hi_q
    FROM ranked GROUP BY c_mktsegment
),
pt AS (
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS s
    FROM joined GROUP BY c_mktsegment
)
SELECT p.c_mktsegment, p.n, p.s // p.n AS point_q,
       ci.n_reps, ci.ci_lo_q, ci.ci_hi_q
FROM pt p LEFT JOIN ci ON p.c_mktsegment = ci.c_mktsegment
ORDER BY p.c_mktsegment
"""
