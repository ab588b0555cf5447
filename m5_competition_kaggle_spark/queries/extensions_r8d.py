"""Round-8 queue, fourth batch — imputation, normalization, survival,
diversified retrieval, streaming experimentation.

Registered BEHIND the r7 window (head-50 fully booked); these certify
locally this round and join x107–x121 in the r8 driver window.

- x122 linear interpolation (``operators/interpolate.py``): exact-
  rational reconstruction of deterministically-masked series points
  from both flanks — the audit reports the interpolation AND its
  signed error against the held-out truth.
- x123 quantile normalization (``operators/quantile_norm.py``):
  integer rank-mapping of each source's doc-length distribution onto
  the pooled global order statistics, global positions via the
  two-phase prefix scan (no global window).
- x124 Kaplan-Meier survival (``operators/survival.py``): right-
  censored product-limit curve of user activity lifetimes; exact
  (n_risk, d) integers anchor the certificate, ppm survival via the
  log-sum precedent.
- x125 MMR diversified top-k (``operators/mmr.py``): integer-exact
  greedy re-rank of x9's exact shortlist — relevance vs redundancy
  with a fully unrolled 3-round SQL twin.
- s19 streaming Welch trajectory (``streaming/welch_monitor.py``):
  the x120 readout as a watermarked per-day monitor; this batch twin
  certifies the day table, tests/test_streaming_welch.py proves the
  stream emits the identical trajectory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.interpolate import (
    linear_interpolate,
)
from m5_competition_kaggle_spark.operators.mmr import mmr_rerank
from m5_competition_kaggle_spark.operators.quantile_norm import (
    quantile_normalize,
)
from m5_competition_kaggle_spark.operators.similarity import (
    brute_force_topk,
)
from m5_competition_kaggle_spark.operators.survival import km_curve
from m5_competition_kaggle_spark.sources.catalog import load_table

NS_PER_DAY = 86_400_000_000_000


def x122_linear_interp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mask every 5th day (epoch_day % 5 == 2) of the per-(event_type,
    day) quantized value total, reconstruct it by exact-rational
    linear interpolation from the flanking observed days, and report
    the signed floor-quotient error against the held-out truth."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("t"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    ).withColumn("masked", F.col("t") % 5 == 2)
    out = linear_interpolate(
        series, ["event_type"], "t", "y", "masked"
    )
    return (
        out.filter(F.col("interp_num").isNotNull())
        .select(
            "event_type", "t",
            F.col("y").alias("y_true"),
            "t_prev", "y_prev", "t_next", "y_next",
            "interp_num", "interp_den", "interp_q",
            (F.col("interp_q") - F.col("y")).alias("err"),
        )
        .orderBy("event_type", "t")
    )


def x123_quantile_norm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile-normalize per-source doc lengths onto the pooled
    global length distribution — integer rank mapping, global order
    statistics via the distributed prefix scan."""
    docs = load_table(spark, sf_dir, "documents")
    return quantile_normalize(
        docs, "source", "n_chars", "doc_id"
    ).orderBy("doc_id")


def x124_km_survival(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kaplan-Meier curve of per-(user, event_type) engagement
    lifetime (last minus first day of that activity); subjects still
    active within 3 days of the corpus edge are right-censored — the
    rest "churned" (death observed at their last activity). Exact
    (t, n_risk, d) integers plus ppm survival."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(f"ts_nanos DIV {NS_PER_DAY}").alias("t"),
    )
    mx = ev.agg(F.max("t").alias("__mt"))
    subj = (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("t1") - F.col("t0")).alias("duration"),
            F.when(F.col("t1") < F.col("__mt") - 3, 1)
            .otherwise(0)
            .alias("event"),
        )
    )
    return km_curve(subj).orderBy("t")


def x125_mmr_diversify(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MMR-diversified top-3 per query (lam = 1/2) from x9's exact
    top-10 shortlist — integer-exact greedy selection; the redundancy
    penalty is the quantized pairwise dot."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    short = brute_force_topk(emb, queries, k=10)
    return mmr_rerank(short, emb, k=3, lam_num=1, lam_den=2).orderBy(
        "query_id", "mmr_rank"
    )


def s19_stream_welch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of the streaming Welch trajectory
    (``streaming/welch_monitor.py``): per-event-time-day t² between
    the user_id%2 arms of the quantized event value, per event type.
    The identical ``day_arm_stats`` plan runs as a watermarked
    tumbling-day streaming agg with `welch_from_stats` per trigger in
    foreachBatch (stream == batch proven in
    tests/test_streaming_welch.py); this query certifies the batch
    side against DuckDB. Where x120 reads the whole window once, this
    is the day-by-day experiment dashboard feed."""
    from m5_competition_kaggle_spark.streaming.welch_monitor import (
        day_arm_stats,
        welch_day_table,
    )

    ev = load_table(spark, sf_dir, "events")
    return welch_day_table(day_arm_stats(ev)).orderBy(
        "day", "event_type"
    )


QUERIES = {
    "x122_linear_interp": x122_linear_interp,
    "x123_quantile_norm": x123_quantile_norm,
    "x124_km_survival": x124_km_survival,
    "x125_mmr_diversify": x125_mmr_diversify,
    "s19_stream_welch": s19_stream_welch,
}

ORACLES: dict[str, str] = {}

ORACLES["x122_linear_interp"] = f"""
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // {NS_PER_DAY} AS t,
           CAST(sum(CAST(round(value * 1000) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
flagged AS (
    SELECT event_type, t, y, (t % 5 = 2) AS masked FROM series
),
flanked AS (
    SELECT event_type, t, y, masked,
           last_value(CASE WHEN NOT masked THEN t END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS t_prev,
           last_value(CASE WHEN NOT masked THEN y END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS y_prev,
           first_value(CASE WHEN NOT masked THEN t END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN 1 FOLLOWING
                     AND UNBOUNDED FOLLOWING) AS t_next,
           first_value(CASE WHEN NOT masked THEN y END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY t
                     ROWS BETWEEN 1 FOLLOWING
                     AND UNBOUNDED FOLLOWING) AS y_next
    FROM flagged
)
SELECT event_type, t, y AS y_true, t_prev, y_prev, t_next, y_next,
       y_prev * (t_next - t_prev)
           + (y_next - y_prev) * (t - t_prev) AS interp_num,
       t_next - t_prev AS interp_den,
       (y_prev * (t_next - t_prev)
           + (y_next - y_prev) * (t - t_prev))
           // (t_next - t_prev) AS interp_q,
       (y_prev * (t_next - t_prev)
           + (y_next - y_prev) * (t - t_prev))
           // (t_next - t_prev) - y AS err
FROM flanked
WHERE masked AND t_prev IS NOT NULL AND t_next IS NOT NULL
ORDER BY event_type, t
"""

ORACLES["x123_quantile_norm"] = """
WITH ranked AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id) AS src_rank,
           CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
               AS src_n
    FROM documents
),
pos AS (
    SELECT n_chars AS norm_value,
           row_number() OVER (ORDER BY n_chars, doc_id) AS pos
    FROM documents
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
mapped AS (
    SELECT r.doc_id, r.source, r.n_chars, r.src_rank, r.src_n,
           CASE WHEN r.src_n > 1
                THEN 1 + ((r.src_rank - 1) * (t.n - 1))
                     // (r.src_n - 1)
                ELSE 1 + (t.n - 1) // 2 END AS mapped_pos
    FROM ranked r CROSS JOIN tot t
)
SELECT m.doc_id, m.source, m.n_chars, m.src_rank, m.src_n,
       m.mapped_pos, p.norm_value
FROM mapped m JOIN pos p ON m.mapped_pos = p.pos
ORDER BY m.doc_id
"""

ORACLES["x124_km_survival"] = f"""
WITH ev AS (
    SELECT user_id, event_type,
           epoch_ns(ts) // {NS_PER_DAY} AS t
    FROM events
),
mx AS (SELECT max(t) AS mt FROM ev),
subj AS (
    SELECT max(e.t) - min(e.t) AS duration,
           CASE WHEN max(e.t) < (SELECT mt FROM mx) - 3
                THEN 1 ELSE 0 END AS event
    FROM ev e GROUP BY e.user_id, e.event_type
),
cells AS (
    SELECT duration AS t, CAST(sum(event) AS BIGINT) AS d,
           CAST(count(*) AS BIGINT) AS c_all
    FROM subj GROUP BY duration
),
tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS n FROM cells),
risk AS (
    SELECT c.t, c.d,
           t2.n - CAST(coalesce(sum(c.c_all) OVER (ORDER BY c.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS n_risk
    FROM cells c CROSS JOIN tot t2
),
curve AS (
    SELECT t, n_risk, d,
           CASE WHEN max(CASE WHEN d > 0 AND d >= n_risk
                              THEN 1 ELSE 0 END)
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) = 1
                THEN CAST(0 AS BIGINT)
                ELSE CAST(round(1e6 * exp(sum(
                    CASE WHEN d > 0 AND n_risk > d
                         THEN ln(CAST(n_risk - d AS DOUBLE)
                                 / n_risk)
                         ELSE 0.0 END)
                    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW))) AS BIGINT)
           END AS surv_ppm
    FROM risk
)
SELECT t, n_risk, d, surv_ppm FROM curve WHERE d > 0 ORDER BY t
"""

_PAIR_DOT = """CAST(list_sum(list_transform(
    generate_series(1, len(e1.embedding)),
    i -> CAST(round(CAST(e1.embedding[i] AS DOUBLE) * 1000)
              AS BIGINT)
       * CAST(round(CAST(e2.embedding[i] AS DOUBLE) * 1000)
              AS BIGINT))) AS BIGINT)"""

ORACLES["x125_mmr_diversify"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(
               generate_series(1, len(e.embedding)),
               i -> CAST(round(CAST(qe[i] AS DOUBLE) * 1000)
                         AS BIGINT)
                  * CAST(round(CAST(e.embedding[i] AS DOUBLE)
                               * 1000) AS BIGINT))) AS BIGINT)
               AS rel
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id),
short AS (
    SELECT query_id, neighbor_id, rel
    FROM (SELECT query_id, neighbor_id, rel,
                 row_number() OVER (PARTITION BY query_id
                     ORDER BY rel DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 10),
pairs AS (
    SELECT s1.query_id, s1.neighbor_id AS i, s2.neighbor_id AS j,
           {_PAIR_DOT} AS sim
    FROM short s1
    JOIN short s2 ON s1.query_id = s2.query_id
                 AND s1.neighbor_id <> s2.neighbor_id
    JOIN embeddings e1 ON e1.vec_id = s1.neighbor_id
    JOIN embeddings e2 ON e2.vec_id = s2.neighbor_id),
sel1 AS (
    SELECT query_id, neighbor_id, rel
    FROM (SELECT query_id, neighbor_id, rel,
                 row_number() OVER (PARTITION BY query_id
                     ORDER BY rel DESC, neighbor_id) AS rn
          FROM short)
    WHERE rn = 1),
c2 AS (
    SELECT s.query_id, s.neighbor_id, s.rel, p.sim AS max_sim
    FROM short s
    JOIN sel1 ON sel1.query_id = s.query_id
    JOIN pairs p ON p.query_id = s.query_id
                AND p.i = s.neighbor_id
                AND p.j = sel1.neighbor_id
    WHERE s.neighbor_id <> sel1.neighbor_id),
sel2 AS (
    SELECT query_id, neighbor_id, rel, max_sim
    FROM (SELECT query_id, neighbor_id, rel, max_sim,
                 row_number() OVER (PARTITION BY query_id
                     ORDER BY rel - max_sim DESC, neighbor_id)
                     AS rn
          FROM c2)
    WHERE rn = 1),
c3 AS (
    SELECT s.query_id, s.neighbor_id, s.rel,
           greatest(p1.sim, p2.sim) AS max_sim
    FROM short s
    JOIN sel1 ON sel1.query_id = s.query_id
    JOIN sel2 ON sel2.query_id = s.query_id
    JOIN pairs p1 ON p1.query_id = s.query_id
                 AND p1.i = s.neighbor_id
                 AND p1.j = sel1.neighbor_id
    JOIN pairs p2 ON p2.query_id = s.query_id
                 AND p2.i = s.neighbor_id
                 AND p2.j = sel2.neighbor_id
    WHERE s.neighbor_id <> sel1.neighbor_id
      AND s.neighbor_id <> sel2.neighbor_id),
sel3 AS (
    SELECT query_id, neighbor_id, rel, max_sim
    FROM (SELECT query_id, neighbor_id, rel, max_sim,
                 row_number() OVER (PARTITION BY query_id
                     ORDER BY rel - max_sim DESC, neighbor_id)
                     AS rn
          FROM c3)
    WHERE rn = 1)
SELECT query_id, 1 AS mmr_rank, neighbor_id, rel,
       CAST(0 AS BIGINT) AS max_sim, rel AS mmr2
FROM sel1
UNION ALL
SELECT query_id, 2 AS mmr_rank, neighbor_id, rel, max_sim,
       rel - max_sim AS mmr2
FROM sel2
UNION ALL
SELECT query_id, 3 AS mmr_rank, neighbor_id, rel, max_sim,
       rel - max_sim AS mmr2
FROM sel3
ORDER BY query_id, mmr_rank
"""

ORACLES["s19_stream_welch"] = """
WITH ev AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type, user_id % 2 AS arm,
           CAST(round(value * 1000) AS BIGINT) AS q
    FROM events
),
agg AS (
    SELECT day, event_type,
           CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
           CAST(sum(CASE WHEN arm = 0 THEN q ELSE 0 END) AS BIGINT)
               AS sum_a,
           CAST(sum(CASE WHEN arm = 1 THEN q ELSE 0 END) AS BIGINT)
               AS sum_b,
           CAST(sum(CASE WHEN arm = 0 THEN q * q ELSE 0 END)
                AS BIGINT) AS ss_a,
           CAST(sum(CASE WHEN arm = 1 THEN q * q ELSE 0 END)
                AS BIGINT) AS ss_b
    FROM ev WHERE arm IN (0, 1)
    GROUP BY day, event_type
)
SELECT day, event_type, n_a, n_b, sum_a, sum_b, ss_a, ss_b,
       CASE WHEN n_a >= 2 AND n_b >= 2 AND
                 ((CAST(ss_a AS DOUBLE)
                   - CAST(sum_a AS DOUBLE) * CAST(sum_a AS DOUBLE)
                     / n_a) / (n_a - 1)) / n_a
                 + ((CAST(ss_b AS DOUBLE)
                   - CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE)
                     / n_b) / (n_b - 1)) / n_b > 0
       THEN (CAST(sum_a AS DOUBLE) / n_a
             - CAST(sum_b AS DOUBLE) / n_b)
            * (CAST(sum_a AS DOUBLE) / n_a
               - CAST(sum_b AS DOUBLE) / n_b)
            / (((CAST(ss_a AS DOUBLE)
                 - CAST(sum_a AS DOUBLE) * CAST(sum_a AS DOUBLE)
                   / n_a) / (n_a - 1)) / n_a
               + ((CAST(ss_b AS DOUBLE)
                   - CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE)
                     / n_b) / (n_b - 1)) / n_b)
       END AS welch_t2
FROM agg
ORDER BY day, event_type
"""
