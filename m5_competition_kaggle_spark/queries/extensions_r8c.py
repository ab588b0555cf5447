"""Round-8 queue, third batch — numeric drift, forensic DQ, mixing.

Registered BEHIND the r7 window (head-50 fully booked); these certify
locally this round and join x107–x116 in the r8 driver window.

- x117 two-sample KS drift (``operators/ksdist.py``): the numeric
  twin of x114's categorical PSI — exact integer Kolmogorov–Smirnov
  distance between the first- and second-half empirical CDFs of the
  quantized event value, per event type. The drift test a feature
  monitor runs on CONTINUOUS features.
- x118 Benford first-digit profile (``operators/benford.py``):
  forensic data-quality screen on order amounts per priority class —
  observed vs expected first-significant-digit permille with the
  expectation as hard-coded integer constants.
- x119 char-budget apportionment (``operators/apportion.py``):
  largest-remainder (Hamilton) allocation of a fixed 100k-char
  sampling budget across document sources — the exact-integer mixing
  plan a shard writer consumes, complementing the probabilistic
  temperature mix (x35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.apportion import (
    largest_remainder,
)
from m5_competition_kaggle_spark.operators.benford import (
    BENFORD_PERMILLE,
    benford_profile,
)
from m5_competition_kaggle_spark.operators.ksdist import ks_statistic
from m5_competition_kaggle_spark.sources.catalog import load_table

# Same drift split as x114: events span 2024-01-01..2024-01-31 UTC,
# halves split at 2024-01-16 00:00 UTC.
KS_SPLIT_NS = 1_705_363_200_000_000_000
MIX_BUDGET = 100_000


def x117_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS distance of the quantized event value
    (round(value*1000) int64 — the QUANT precedent), first half of
    the window vs second, per event type. d_num/d_den is the exact
    rational statistic; ks_permille its floor permille."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts_nanos",
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    ref = ev.filter(F.col("ts_nanos") < F.lit(KS_SPLIT_NS))
    cmp_w = ev.filter(F.col("ts_nanos") >= F.lit(KS_SPLIT_NS))
    return ks_statistic(ref, cmp_w, "event_type", "q").orderBy(
        "event_type"
    )


def x118_benford_digits(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benford first-digit profile of order amounts (exact cents)
    per order priority: observed permille vs the hard-coded integer
    expectation, signed deviation."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT)"
        ).alias("cents"),
    )
    return benford_profile(
        o, "cents", ["o_orderpriority"]
    ).orderBy("o_orderpriority", "digit")


def x119_char_budget_mix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Largest-remainder apportionment of a fixed 100k-char budget
    across document sources, weighted by total corpus chars — the
    exact mixing plan; shares sum to the budget by construction."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    )
    return largest_remainder(
        docs, "source", "n_chars", MIX_BUDGET
    ).orderBy("source")


def s18_stream_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming KS trajectory
    (``streaming/ks_monitor.py``): per-event-time-day exact KS
    distance of that day's integer-quantized value distribution
    against the frozen first-half reference histogram. The identical
    ``day_bucket_counts`` plan runs as a watermarked tumbling-day
    streaming agg with the assembly per trigger in foreachBatch
    (stream == batch proven in tests/test_streaming_ks.py, through
    the shared ``ks_from_cells`` kernel); this query certifies the
    batch side against DuckDB. Where x117 answers 'did the window
    drift' once, this is the day-by-day numeric monitor feed."""
    from m5_competition_kaggle_spark.streaming.ks_monitor import (
        day_bucket_counts,
        ks_day_table,
    )

    ev = load_table(spark, sf_dir, "events")
    ref_counts = (
        ev.filter(F.col("ts_nanos") < F.lit(KS_SPLIT_NS))
        .groupBy(
            F.expr("CAST(round(value) AS BIGINT)").alias("q")
        )
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    days = day_bucket_counts(ev, since_nanos=KS_SPLIT_NS)
    return ks_day_table(days, ref_counts).orderBy("day")


QUERIES = {
    "x117_ks_drift": x117_ks_drift,
    "x118_benford_digits": x118_benford_digits,
    "x119_char_budget_mix": x119_char_budget_mix,
    "s18_stream_ks": s18_stream_ks,
}

ORACLES: dict[str, str] = {}

ORACLES["x117_ks_drift"] = f"""
WITH ev AS (
    SELECT event_type,
           epoch_ns(ts) AS ts_nanos,
           CAST(round(value * 1000) AS BIGINT) AS q
    FROM events
),
cells AS (
    SELECT event_type AS grp, q,
           CAST(sum(CASE WHEN ts_nanos < {KS_SPLIT_NS} THEN 1
                         ELSE 0 END) AS BIGINT) AS c_ref,
           CAST(sum(CASE WHEN ts_nanos >= {KS_SPLIT_NS} THEN 1
                         ELSE 0 END) AS BIGINT) AS c_cmp
    FROM ev GROUP BY event_type, q
),
scored AS (
    SELECT grp, q,
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
dd AS (
    SELECT grp, q, n_ref, n_cmp,
           abs(n_cmp * cum_ref - n_ref * cum_cmp) AS d_num
    FROM scored WHERE n_ref > 0 AND n_cmp > 0
),
picked AS (
    SELECT grp, q, n_ref, n_cmp, d_num,
           row_number() OVER (PARTITION BY grp
               ORDER BY d_num DESC, q ASC) AS rn
    FROM dd
)
SELECT grp AS event_type, n_ref, n_cmp, q AS q_at, d_num,
       n_ref * n_cmp AS d_den,
       (1000 * d_num) // (n_ref * n_cmp) AS ks_permille
FROM picked WHERE rn = 1
ORDER BY event_type
"""

_BENFORD_SQL_ARR = "[" + ", ".join(
    str(v) for v in BENFORD_PERMILLE
) + "]"

ORACLES["x118_benford_digits"] = f"""
WITH amounts AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
counted AS (
    SELECT o_orderpriority,
           CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
               AS digit,
           CAST(count(*) AS BIGINT) AS n
    FROM amounts WHERE cents > 0
    GROUP BY o_orderpriority, digit
),
exp_map AS (
    SELECT CAST(i AS BIGINT) AS digit,
           CAST(({_BENFORD_SQL_ARR})[i] AS BIGINT) AS exp_permille
    FROM unnest(range(1, 10)) AS t(i)
)
SELECT c.o_orderpriority, c.digit, c.n,
       CAST(sum(c.n) OVER (PARTITION BY c.o_orderpriority)
            AS BIGINT) AS n_total,
       (1000 * c.n) // CAST(sum(c.n) OVER (
            PARTITION BY c.o_orderpriority) AS BIGINT)
           AS obs_permille,
       e.exp_permille,
       (1000 * c.n) // CAST(sum(c.n) OVER (
            PARTITION BY c.o_orderpriority) AS BIGINT)
           - e.exp_permille AS dev_permille
FROM counted c JOIN exp_map e ON c.digit = e.digit
ORDER BY c.o_orderpriority, c.digit
"""

ORACLES["x119_char_budget_mix"] = f"""
WITH weights AS (
    SELECT source AS key, CAST(sum(n_chars) AS BIGINT) AS weight
    FROM documents GROUP BY source
),
scored AS (
    SELECT key, weight,
           CAST(sum(weight) OVER () AS BIGINT) AS w_total
    FROM weights
),
shares AS (
    SELECT key, weight,
           ({MIX_BUDGET} * weight) // w_total AS floor_share,
           ({MIX_BUDGET} * weight) % w_total AS remainder
    FROM scored
),
ranked AS (
    SELECT key, weight, floor_share, remainder,
           {MIX_BUDGET} - CAST(sum(floor_share) OVER () AS BIGINT)
               AS leftover,
           row_number() OVER (ORDER BY remainder DESC, key ASC)
               AS rank
    FROM shares
)
SELECT key AS source, weight, floor_share, remainder,
       CAST(CASE WHEN rank <= leftover AND remainder > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS extra,
       floor_share + CASE WHEN rank <= leftover AND remainder > 0
                          THEN 1 ELSE 0 END AS share
FROM ranked
ORDER BY source
"""

ORACLES["s18_stream_ks"] = f"""
WITH ref AS (
    SELECT CAST(round(value) AS BIGINT) AS q,
           CAST(count(*) AS BIGINT) AS c_ref
    FROM events WHERE epoch_ns(ts) < {KS_SPLIT_NS}
    GROUP BY 1
),
dc AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(round(value) AS BIGINT) AS q,
           CAST(count(*) AS BIGINT) AS c_cmp
    FROM events WHERE epoch_ns(ts) >= {KS_SPLIT_NS}
    GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM dc),
grid AS (SELECT days.day, ref.q, ref.c_ref
         FROM days CROSS JOIN ref),
cells AS (
    SELECT coalesce(grid.day, dc.day) AS day,
           coalesce(grid.q, dc.q) AS q,
           CAST(coalesce(grid.c_ref, 0) AS BIGINT) AS c_ref,
           CAST(coalesce(dc.c_cmp, 0) AS BIGINT) AS c_cmp
    FROM grid FULL OUTER JOIN dc
      ON grid.day = dc.day AND grid.q = dc.q
),
scored AS (
    SELECT day, q,
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
dd AS (
    SELECT day, q, n_ref, n_cmp,
           abs(n_cmp * cum_ref - n_ref * cum_cmp) AS d_num
    FROM scored WHERE n_ref > 0 AND n_cmp > 0
),
picked AS (
    SELECT day, q, n_ref, n_cmp, d_num,
           row_number() OVER (PARTITION BY day
               ORDER BY d_num DESC, q ASC) AS rn
    FROM dd
)
SELECT day, n_ref, n_cmp, q AS q_at, d_num,
       n_ref * n_cmp AS d_den,
       (1000 * d_num) // (n_ref * n_cmp) AS ks_permille
FROM picked WHERE rn = 1
ORDER BY day
"""


def x120_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch t² A/B readout (``operators/abtest.py``) of the
    quantized event value per event type, arms assigned by
    user_id % 2 — exact int64 sufficient statistics plus the t²
    double via the shared arithmetic-only expression tree (x107/x114
    precedent). The experiment-dashboard certificate: the generator
    assigns arms uniformly, so t² near zero IS the correct reading
    and a regression in any branch flips it loudly."""
    from m5_competition_kaggle_spark.operators.abtest import (
        welch_readout,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("arm"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    return welch_readout(ev, "event_type", "arm", "q").orderBy(
        "event_type"
    )


QUERIES["x120_ab_welch"] = x120_ab_welch

ORACLES["x120_ab_welch"] = """
WITH ev AS (
    SELECT event_type, user_id % 2 AS arm,
           CAST(round(value * 1000) AS BIGINT) AS q
    FROM events
),
agg AS (
    SELECT event_type,
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
    GROUP BY event_type
)
SELECT event_type, n_a, n_b, sum_a, sum_b, ss_a, ss_b,
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
ORDER BY event_type
"""


def x121_target_encode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leakage-free leave-one-out target encoding
    (``operators/target_encode.py``) of the customer market segment
    by exact order cents: every order's encoding is the mean of the
    OTHER orders in its segment, as the exact (num, den) rational
    plus truncating quotient. The feature-engineering certificate: a
    wrong join or an off-by-one in the leave-one-out arithmetic
    flips row-level hashes immediately."""
    from m5_competition_kaggle_spark.operators.target_encode import (
        loo_target_encode,
    )

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
    return (
        loo_target_encode(joined, "c_mktsegment", "cents")
        .select(
            "o_orderkey", "c_mktsegment", "cents", "cat_n",
            "loo_num", "loo_den", "loo_q",
        )
        .orderBy("o_orderkey")
    )


QUERIES["x121_target_encode"] = x121_target_encode

ORACLES["x121_target_encode"] = """
WITH joined AS (
    SELECT o.o_orderkey, c.c_mktsegment,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
stats AS (
    SELECT c_mktsegment, CAST(sum(cents) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS cat_n
    FROM joined GROUP BY c_mktsegment
)
SELECT j.o_orderkey, j.c_mktsegment, j.cents, st.cat_n,
       CASE WHEN st.cat_n > 1 THEN st.s - j.cents END AS loo_num,
       CASE WHEN st.cat_n > 1 THEN st.cat_n - 1 END AS loo_den,
       CASE WHEN st.cat_n > 1
            THEN (st.s - j.cents) // (st.cat_n - 1) END AS loo_q
FROM joined j JOIN stats st ON j.c_mktsegment = st.c_mktsegment
ORDER BY j.o_orderkey
"""
