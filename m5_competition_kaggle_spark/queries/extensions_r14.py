"""Round-14 queue — STAGED UNREGISTERED, two rounds ahead (the r12
and r13 windows are planned; see queries/__init__.py). Locally
certified by ``tests/test_r14_queue.py`` with the same Spark-vs-DuckDB
differential as ``scripts/check_oracle.py``.

- x171 Markov sequence surprisal (``operators/markov.py``): every
  user timeline scored against the corpus first-order event-type
  transition model in exact micro-nat integers — the top-15 users
  whose event grammar the population finds most surprising. The
  sequence-level anomaly screen beside the per-event z-score flags
  (x66 family) and the transition-count matrix (g18).
- x172 per-brand sales Gini (``operators/gini.py``): exact
  tie-invariant Gini of per-part unit-sales concentration within each
  brand, zero-sales parts included — the Lorenz complement to the
  HHI screen (x49 family). Grouped-value-cell closed form, so the
  rank sums certify as integers.
- x173 cross-covariance lead–lag: x170's exact-integer autocovariance
  extended ACROSS series — daily unit-value series of every event-type
  pair at lags −7..+7, peak-normalized permille, with the peak lag
  marked. Detects which streams lead and which follow (the
  cross-series dependency x107's per-day mutual information cannot
  localize in time).
- x174 per-document KL novelty: exact micro-nat
  KL(doc unigram ‖ corpus unigram) via the quantized-ln precedent —
  the top-15 most out-of-distribution documents, the retrieval-side
  twin of x106's vocabulary drift (which compares corpus slices, not
  single docs).
- x175 CvM drift (``operators/cvm.py``): the whole-distribution
  companion to x117's KS on the same split and quantization —
  permille-quantized Cramér–von Mises gap energy per event type,
  integrating the SQUARED ECDF gap so broad low-amplitude drift
  surfaces even when no single point crosses the KS max.
- s26 streaming CvM trajectory (``streaming/cvm_monitor.py``): the
  x175 readout assembled per event-time day from the KS monitor's
  EXISTING calendar-bounded cells — one streaming kernel, two drift
  readouts (the s18 twin relationship, and the trend-monitor
  multi-assembly pattern applied to the distribution monitor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.cvm import cvm_statistic
from m5_competition_kaggle_spark.operators.gini import gini_by_group
from m5_competition_kaggle_spark.operators.markov import (
    transition_surprisal,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

# The x114/x117 drift split: events span 2024-01-01..2024-01-31 UTC,
# halves split at 2024-01-16 00:00 UTC.
SPLIT_NS = 1_705_363_200_000_000_000
LOG_Q = 1_000_000
MIN_TRANS = 5  # x171: score only timelines with >= 5 transitions
MIN_TOKENS = 20  # x174: KL of near-empty docs is all quantization
TOP_N = 15

# --------------------------------------------------------------- x171


def x171_markov_surprisal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-15 most grammatically surprising user timelines under the
    corpus transition model (mean micro-nat surprisal, >= 5
    transitions; ties broken by user_id). The timeline order is
    (ts_nanos, event_id) — a unique key, so lag() is deterministic in
    both engines. Plan: one keyed window (transitions), one keyed agg
    (model counts, |event_type|^2 rows), a broadcast join back, one
    keyed agg per user, TakeOrdered top-15."""
    ev = load_table(spark, sf_dir, "events")
    scored = transition_surprisal(
        ev, "user_id", "event_type", ("ts_nanos", "event_id")
    )
    return (
        scored.filter(F.col("n_trans") >= MIN_TRANS)
        .select(
            F.col("key").alias("user_id"),
            "n_trans",
            "sum_surprisal_unat",
            "mean_surprisal_unat",
        )
        .orderBy(
            F.col("mean_surprisal_unat").desc(),
            F.col("user_id").asc(),
        )
        .limit(TOP_N)
    )


ORACLE_X171 = f"""
WITH ordered AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS a
    FROM events
),
pairs AS (
    SELECT user_id AS key, a, event_type AS b
    FROM ordered WHERE a IS NOT NULL
),
cab AS (
    SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
    FROM pairs GROUP BY a, b
),
ca AS (
    SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY a
),
model AS (
    SELECT cab.a, cab.b,
           CAST(round(ln(ca.c_a) * {LOG_Q}) AS BIGINT)
           - CAST(round(ln(cab.c_ab) * {LOG_Q}) AS BIGINT) AS s_unat
    FROM cab JOIN ca ON ca.a = cab.a
),
per_key AS (
    SELECT p.key,
           CAST(count(*) AS BIGINT) AS n_trans,
           CAST(sum(m.s_unat) AS BIGINT) AS sum_surprisal_unat
    FROM pairs p JOIN model m ON m.a = p.a AND m.b = p.b
    GROUP BY p.key
)
SELECT key AS user_id, n_trans, sum_surprisal_unat,
       sum_surprisal_unat // n_trans AS mean_surprisal_unat
FROM per_key
WHERE n_trans >= {MIN_TRANS}
ORDER BY mean_surprisal_unat DESC, user_id ASC
LIMIT {TOP_N}
"""

# --------------------------------------------------------------- x172


def x172_sales_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-brand Gini of per-part unit-sales concentration.
    Members are ALL parts of the brand — a part with zero lineitem
    rows holds a rank at quantity 0 (a catalog that mostly doesn't
    sell is the inequality a buyer cares about). Per-part quantity is
    the BIGINT unit sum round(l_quantity); the fact-side aggregation
    shrinks lineitem to one row per part BEFORE the dimension join,
    so the join is dimension-sized."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr("CAST(round(l_quantity) AS BIGINT)")
            ).alias("q")
        )
    )
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    member = parts.join(
        li, parts.p_partkey == li.l_partkey, "left"
    ).select(
        "p_brand", F.coalesce("q", F.lit(0)).alias("qty")
    )
    return gini_by_group(member, ["p_brand"], "qty").orderBy(
        "p_brand"
    )


ORACLE_X172 = """
WITH sales AS (
    SELECT l_partkey,
           CAST(sum(CAST(round(l_quantity) AS BIGINT))
                AS BIGINT) AS q
    FROM lineitem GROUP BY l_partkey
),
member AS (
    SELECT p.p_brand, coalesce(s.q, 0) AS qty
    FROM part p LEFT JOIN sales s ON s.l_partkey = p.p_partkey
),
cells AS (
    SELECT p_brand, qty AS q, CAST(count(*) AS BIGINT) AS c
    FROM member GROUP BY p_brand, qty
),
scored AS (
    SELECT p_brand, q, c,
           CAST(sum(c) OVER (PARTITION BY p_brand ORDER BY q
                ROWS UNBOUNDED PRECEDING) AS BIGINT) - c AS a_prev
    FROM cells
),
agg AS (
    SELECT p_brand,
           CAST(sum(c) AS BIGINT) AS n_members,
           CAST(sum(q * c) AS BIGINT) AS total,
           CAST(max(q) AS BIGINT) AS max_value,
           CAST(sum(q * (c * a_prev + (c * (c + 1)) // 2))
                AS BIGINT) AS rank_mass
    FROM scored GROUP BY p_brand
)
SELECT p_brand, n_members, total, max_value,
       CASE WHEN total > 0 THEN
           (1000000 * max_value) // total END AS top_share_ppm,
       rank_mass,
       CASE WHEN total > 0 THEN
           (1000000 * (2 * rank_mass - (n_members + 1) * total))
           // (n_members * total) END AS gini_ppm
FROM agg ORDER BY p_brand
"""

# --------------------------------------------------------------- x173


def x173_xcov_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer cross-covariance between every event-type pair
    (a < b) at lags −7..+7 over the daily unit-value series (the x170
    construction and overflow contract). cov_num_k = n_k·Σ(ya·yb) −
    Σya·Σyb pairing a's day t with b's day t+k; ratio_permille is the
    sign-handled floor permille against the pair's peak |cov_num|,
    and is_peak marks the lag(s) attaining it — a positive peak at
    k > 0 says a LEADS b by k days. Bounded output by construction:
    |types|·(|types|−1)/2 pairs × 15 lags."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_nanos DIV 86400000000000").alias("t"),
        F.expr("CAST(round(value) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    lags = F.explode(
        F.array(*[F.lit(k) for k in range(-7, 8)])
    ).alias("k")
    a = series.select(
        F.col("event_type").alias("ta"),
        "t",
        F.col("y").alias("ya"),
        lags,
    )
    b = series.select(
        F.col("event_type").alias("tb_type"),
        F.col("t").alias("tb"),
        F.col("y").alias("yb"),
    )
    paired = a.join(b, F.col("tb") == F.col("t") + F.col("k")).filter(
        F.col("ta") < F.col("tb_type")
    )
    cov = paired.groupBy("ta", "tb_type", "k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("ya").alias("sa"),
        F.sum("yb").alias("sb"),
        F.sum(F.col("ya") * F.col("yb")).alias("sab"),
    ).select(
        F.col("ta").alias("type_a"),
        F.col("tb_type").alias("type_b"),
        F.col("k").cast("long").alias("k"),
        "n_pairs",
        (
            F.col("n_pairs") * F.col("sab")
            - F.col("sa") * F.col("sb")
        ).alias("cov_num"),
    )
    peak = cov.groupBy("type_a", "type_b").agg(
        F.max(F.abs(F.col("cov_num"))).alias("peak_abs")
    )
    return (
        cov.join(peak, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "k",
            "n_pairs",
            "cov_num",
            F.expr(
                "CASE WHEN peak_abs > 0 THEN"
                " CASE WHEN cov_num >= 0 THEN"
                "   (1000 * cov_num) DIV peak_abs"
                " ELSE -((1000 * (-cov_num)) DIV peak_abs)"
                " END END"
            ).alias("ratio_permille"),
            (F.abs(F.col("cov_num")) == F.col("peak_abs")).alias(
                "is_peak"
            ),
        )
        .orderBy("type_a", "type_b", "k")
    )


ORACLE_X173 = """
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(sum(CAST(round(value) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
lagk AS (SELECT unnest(generate_series(-7, 7)) AS k),
paired AS (
    SELECT a.event_type AS ta, b.event_type AS tb, l.k,
           a.y AS ya, b.y AS yb
    FROM series a
    CROSS JOIN lagk l
    JOIN series b ON b.t = a.t + l.k
    WHERE a.event_type < b.event_type
),
cov AS (
    SELECT ta AS type_a, tb AS type_b, CAST(k AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) AS BIGINT)
               * CAST(sum(ya * yb) AS BIGINT)
               - CAST(sum(ya) AS BIGINT)
               * CAST(sum(yb) AS BIGINT) AS cov_num
    FROM paired GROUP BY 1, 2, 3
),
peak AS (
    SELECT type_a, type_b,
           CAST(max(abs(cov_num)) AS BIGINT) AS peak_abs
    FROM cov GROUP BY 1, 2
)
SELECT c.type_a, c.type_b, c.k, c.n_pairs, c.cov_num,
       CASE WHEN p.peak_abs > 0 THEN
           CASE WHEN c.cov_num >= 0 THEN
               (1000 * c.cov_num) // p.peak_abs
           ELSE -((1000 * (-c.cov_num)) // p.peak_abs)
           END END AS ratio_permille,
       abs(c.cov_num) = p.peak_abs AS is_peak
FROM cov c JOIN peak p
  ON p.type_a = c.type_a AND p.type_b = c.type_b
ORDER BY c.type_a, c.type_b, c.k
"""

# --------------------------------------------------------------- x174


def x174_doc_kl_novelty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-15 most out-of-distribution documents by exact micro-nat
    KL(doc unigram ‖ corpus unigram), docs with >= 20 tokens (the x30
    lowercase-alnum token rule). Per-token contribution
    c_dw·(L(c_dw) + L(N) − L(n_d) − L(C_w)) with L(x) =
    round(ln(x)·1e6) on BIGINTs (bit-identical cross-engine — the
    x167 precedent); kl_unat is the sign-handled floor division by
    n_d. Plan: tokenize once, two keyed aggs (doc-term, corpus-term),
    a keyed join on token, a 1-row broadcast for N — no global sort,
    TakeOrdered top-15."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(
            "filter(split(lower(text), '[^a-z0-9]+'),"
            " x -> x <> '')"
        ).alias("ws"),
    )
    tok = docs.select(
        "doc_id", F.explode("ws").alias("w")
    )
    dw = tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("c_dw")
    )
    nd = dw.groupBy("doc_id").agg(F.sum("c_dw").alias("n_d"))
    cw = dw.groupBy("w").agg(F.sum("c_dw").alias("c_w"))
    tot = cw.agg(F.sum("c_w").alias("n_corpus"))
    contrib = (
        dw.join(nd, "doc_id")
        .join(cw, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_d",
            (
                F.col("c_dw")
                * F.expr(
                    f"CAST(round(ln(c_dw) * {LOG_Q}) AS BIGINT)"
                    f" + CAST(round(ln(n_corpus) * {LOG_Q})"
                    f"   AS BIGINT)"
                    f" - CAST(round(ln(n_d) * {LOG_Q}) AS BIGINT)"
                    f" - CAST(round(ln(c_w) * {LOG_Q}) AS BIGINT)"
                )
            ).alias("num"),
        )
    )
    scored = (
        contrib.groupBy("doc_id", "n_d")
        .agg(F.sum("num").alias("kl_num"))
        .filter(F.col("n_d") >= MIN_TOKENS)
        .select(
            "doc_id",
            F.col("n_d").alias("n_tokens"),
            F.expr(
                "CASE WHEN kl_num >= 0 THEN kl_num DIV n_d"
                " ELSE -((-kl_num) DIV n_d) END"
            ).alias("kl_unat"),
        )
    )
    src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    return (
        scored.join(src, "doc_id")
        .select("doc_id", "source", "n_tokens", "kl_unat")
        .orderBy(F.col("kl_unat").desc(), F.col("doc_id").asc())
        .limit(TOP_N)
    )


ORACLE_X174 = f"""
WITH base AS (
    SELECT doc_id, source,
           list_filter(regexp_split_to_array(lower(text),
                                             '[^a-z0-9]+'),
                       x -> x <> '') AS ws
    FROM documents
),
tok AS (
    SELECT doc_id, unnest(ws) AS w FROM base
),
dw AS (
    SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c_dw
    FROM tok GROUP BY doc_id, w
),
nd AS (
    SELECT doc_id, CAST(sum(c_dw) AS BIGINT) AS n_d
    FROM dw GROUP BY doc_id
),
cw AS (
    SELECT w, CAST(sum(c_dw) AS BIGINT) AS c_w FROM dw GROUP BY w
),
tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_corpus FROM cw),
contrib AS (
    SELECT dw.doc_id, nd.n_d,
           dw.c_dw * (
               CAST(round(ln(dw.c_dw) * {LOG_Q}) AS BIGINT)
               + CAST(round(ln(tot.n_corpus) * {LOG_Q}) AS BIGINT)
               - CAST(round(ln(nd.n_d) * {LOG_Q}) AS BIGINT)
               - CAST(round(ln(cw.c_w) * {LOG_Q}) AS BIGINT)
           ) AS num
    FROM dw
    JOIN nd ON nd.doc_id = dw.doc_id
    JOIN cw ON cw.w = dw.w
    CROSS JOIN tot
),
scored AS (
    SELECT doc_id, n_d AS n_tokens,
           CAST(sum(num) AS BIGINT) AS kl_num
    FROM contrib GROUP BY doc_id, n_d
    HAVING n_d >= {MIN_TOKENS}
)
SELECT s.doc_id, b.source, s.n_tokens,
       CASE WHEN s.kl_num >= 0 THEN s.kl_num // s.n_tokens
            ELSE -((-s.kl_num) // s.n_tokens) END AS kl_unat
FROM scored s JOIN base b ON b.doc_id = s.doc_id
ORDER BY kl_unat DESC, s.doc_id ASC
LIMIT {TOP_N}
"""

# --------------------------------------------------------------- x175


def x175_cvm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permille-quantized Cramér–von Mises gap energy per event type
    on the x117 split and quantization (round(value·1000), first half
    vs second): where x117 reads the worst single point of the ECDF
    gap, omega2_micro integrates the SQUARED gap over the pooled
    distribution — the broad-drift readout. Same cells, complementary
    statistic (`operators/cvm.py` for the arithmetic and overflow
    contract)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts_nanos",
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    ref = ev.filter(F.col("ts_nanos") < F.lit(SPLIT_NS))
    cmp_w = ev.filter(F.col("ts_nanos") >= F.lit(SPLIT_NS))
    return cvm_statistic(ref, cmp_w, "event_type", "q").orderBy(
        "event_type"
    )


ORACLE_X175 = f"""
WITH ev AS (
    SELECT event_type,
           epoch_ns(ts) AS ts_nanos,
           CAST(round(value * 1000) AS BIGINT) AS q
    FROM events
),
cells AS (
    SELECT event_type AS grp, q,
           CAST(sum(CASE WHEN ts_nanos < {SPLIT_NS} THEN 1
                         ELSE 0 END) AS BIGINT) AS c_ref,
           CAST(sum(CASE WHEN ts_nanos >= {SPLIT_NS} THEN 1
                         ELSE 0 END) AS BIGINT) AS c_cmp
    FROM ev GROUP BY event_type, q
),
scored AS (
    SELECT grp, q, c_ref, c_cmp,
           CAST(sum(c_ref) OVER (PARTITION BY grp ORDER BY q
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ref,
           CAST(sum(c_cmp) OVER (PARTITION BY grp ORDER BY q
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cmp,
           CAST(sum(c_ref) OVER (PARTITION BY grp) AS BIGINT)
               AS n_ref,
           CAST(sum(c_cmp) OVER (PARTITION BY grp) AS BIGINT)
               AS n_cmp
    FROM cells
),
gapped AS (
    SELECT grp, n_ref, n_cmp, c_ref, c_cmp,
           (1000 * abs(n_cmp * cum_ref - n_ref * cum_cmp))
               // (n_ref * n_cmp) AS gap_pm
    FROM scored WHERE n_ref > 0 AND n_cmp > 0
)
SELECT grp AS event_type, n_ref, n_cmp,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum((c_ref + c_cmp) * gap_pm * gap_pm)
            AS BIGINT) AS gap_energy,
       CAST(sum((c_ref + c_cmp) * gap_pm * gap_pm) AS BIGINT)
           // (n_ref + n_cmp) AS omega2_micro
FROM gapped GROUP BY grp, n_ref, n_cmp
ORDER BY event_type
"""

# ---------------------------------------------------------------- s26


def s26_stream_cvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming CvM trajectory
    (``streaming/cvm_monitor.py``): per-event-time-day CvM gap energy
    of that day's integer-quantized value distribution against the
    frozen first-half reference histogram — assembled from the SAME
    calendar-bounded (day, bucket) cells the s18 KS monitor already
    maintains (one streaming kernel, two drift readouts; stream ==
    batch proven in tests/test_r14_queue.py through the shared
    ``cvm_day_table`` assembly)."""
    from m5_competition_kaggle_spark.streaming.cvm_monitor import (
        cvm_day_table,
    )
    from m5_competition_kaggle_spark.streaming.ks_monitor import (
        day_bucket_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    ref_counts = (
        ev.filter(F.col("ts_nanos") < F.lit(SPLIT_NS))
        .groupBy(
            F.expr("CAST(round(value) AS BIGINT)").alias("q")
        )
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    days = day_bucket_counts(ev, since_nanos=SPLIT_NS)
    return cvm_day_table(days, ref_counts).orderBy("day")


ORACLE_S26 = f"""
WITH ref AS (
    SELECT CAST(round(value) AS BIGINT) AS q,
           CAST(count(*) AS BIGINT) AS c_ref
    FROM events WHERE epoch_ns(ts) < {SPLIT_NS}
    GROUP BY 1
),
dc AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(round(value) AS BIGINT) AS q,
           CAST(count(*) AS BIGINT) AS c_cmp
    FROM events WHERE epoch_ns(ts) >= {SPLIT_NS}
    GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM dc),
grid AS (SELECT days.day, ref.q, ref.c_ref
         FROM days CROSS JOIN ref),
cells AS (
    SELECT coalesce(g.day, d.day) AS day,
           coalesce(g.q, d.q) AS q,
           coalesce(g.c_ref, 0) AS c_ref,
           coalesce(d.c_cmp, 0) AS c_cmp
    FROM grid g FULL OUTER JOIN dc d
      ON d.day = g.day AND d.q = g.q
),
scored AS (
    SELECT day, q, c_ref, c_cmp,
           CAST(sum(c_ref) OVER (PARTITION BY day ORDER BY q
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ref,
           CAST(sum(c_cmp) OVER (PARTITION BY day ORDER BY q
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cmp,
           CAST(sum(c_ref) OVER (PARTITION BY day) AS BIGINT)
               AS n_ref,
           CAST(sum(c_cmp) OVER (PARTITION BY day) AS BIGINT)
               AS n_cmp
    FROM cells
),
gapped AS (
    SELECT day, n_ref, n_cmp, c_ref, c_cmp,
           (1000 * abs(n_cmp * cum_ref - n_ref * cum_cmp))
               // (n_ref * n_cmp) AS gap_pm
    FROM scored WHERE n_ref > 0 AND n_cmp > 0
)
SELECT day, n_ref, n_cmp,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum((c_ref + c_cmp) * gap_pm * gap_pm)
            AS BIGINT) AS gap_energy,
       CAST(sum((c_ref + c_cmp) * gap_pm * gap_pm) AS BIGINT)
           // (n_ref + n_cmp) AS omega2_micro
FROM gapped GROUP BY day, n_ref, n_cmp
ORDER BY day
"""


QUERIES = {
    "x171_markov_surprisal": x171_markov_surprisal,
    "x172_sales_gini": x172_sales_gini,
    "x173_xcov_leadlag": x173_xcov_leadlag,
    "x174_doc_kl_novelty": x174_doc_kl_novelty,
    "x175_cvm_drift": x175_cvm_drift,
    "s26_stream_cvm": s26_stream_cvm,
}

ORACLES = {
    "x171_markov_surprisal": ORACLE_X171,
    "x172_sales_gini": ORACLE_X172,
    "x173_xcov_leadlag": ORACLE_X173,
    "x174_doc_kl_novelty": ORACLE_X174,
    "x175_cvm_drift": ORACLE_X175,
    "s26_stream_cvm": ORACLE_S26,
}
