"""Round-20 queue — STAGED UNREGISTERED, the end of the horizon
(r13–r19 queues are staged; see queries/__init__.py). Locally
certified by ``tests/test_r20_queue.py`` with the same Spark-vs-DuckDB
differential as ``scripts/check_oracle.py``.

Three compositions that close diagnostic loops opened by earlier
certified operators:

- x195 residual ACF: x170's exact autocovariance profile applied to
  the RESIDUALS of the lag-7 seasonal-naive forecaster (x168's
  numerator series) — the adequacy loop: if lag-7 captured the weekly
  structure, the residual lag-7 ratio collapses toward 0 where x170's
  raw series spikes. Sign-handled floor division throughout (residual
  covariances go negative, where x170's raw-volume ones don't).
- x196 discount lift: exact per-brand OLS components of unit quantity
  on discount permille over lineitem×part — does discounting move
  volume, left as the x92/x73 rational (slope_num/slope_den) with a
  sign-handled ppm. The pricing-analytics staple.
- x197 weekend shift: Welch-style exact sufficient statistics of
  weekday vs weekend daily volumes per event type (epoch-day mod 7;
  day 0 = Thursday, weekend ≡ 2,3) — the calendar A/B beside x120's
  group A/B, all moments as integers so the hash certifies without a
  t-table.

Two layout/plan-audit certificates added in the r13 second session:

- x203 bucket balance: the pre-``bucketBy`` occupancy certificate —
  the full 64-bucket grid under the engine's own h64 hash for a good
  key (user_id) and a deliberately bad one (event_type, 5 values →
  ≤5 buckets), empty buckets as zero rows. The audit a 100 TB layout
  decision is gated on, measuring the REAL hash, not a lookalike.
- x204 join-cardinality audit: key overlap, orphan mass, fan-out
  extremes and the EXACT join output size (Σ cnt_l·cnt_r in a
  DECIMAL(38,0) transient) for orders ⋈ customer — computed from the
  two per-key count tables, |keys|-sized bookkeeping instead of the
  join itself; est == actual pinned against a real join.
- x210 key-skew certificate (added r13 second session): the one-row
  go/no-go behind the salting decision — exact skew_ppm (hot key as
  a multiple of fair share) and Herfindahl hhi_ppm per candidate
  shuffle key, from one map-side-combining count and one global
  aggregate; uniform and 98/1/1 plants pin the closed forms.
- x215 MAD outliers (added r14): per-type lower median, median
  absolute deviation, and the beyond-3·MAD outlier count in exact
  integer rank math over the value HISTOGRAM (state bounded by the
  value range, not the corpus) — the robust-fence audit beside
  x83's winsorized mean; the MAD = 0 degenerate fence pinned.
- x217 changepoint split (added r14): binary-segmentation
  localization of the best single level-shift split per type's
  daily series, scored as the exact-integer R² in ppm via one
  cross-multiplied DECIMAL(38,0) ratio — the WHERE beside s23's
  streaming WHEN; planted step series pin the split day and R²
  closed-form; constant series pin the NULLS LAST argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from m5_competition_kaggle_spark.sources.catalog import load_table

NANOS_PER_DAY = 86_400_000_000_000

# scale·num computes in DECIMAL(38,0), not BIGINT (r12: the 100×
# facts probe caught x196's 10⁶·slope_num past int64 at 60M rows —
# the aggregates and outputs stay BIGINT-exact, only the transient
# scaled product widens; quotient casts back to BIGINT). Truncation
# toward zero on both branches matches the oracles' HUGEINT // with
# explicit sign emulation.
#
# Loud-envelope guards (r12 ADVICE) — three breach paths: (1) scaled
# product past DECIMAL(38,0): ANSI raises NUMERIC_VALUE_OUT_OF_RANGE
# on its own (this session runs ANSI); (2) quotient past int64:
# decimal DIV silently WRAPS to a long EVEN UNDER ANSI (measured:
# int64max·10⁶ DIV 1 → −10⁶) — the abs() pre-check raises before the
# wrapping DIV can emit a wrong value (callers guard {den} > 0);
# (3) under a non-ANSI deployment the casts NULL silently — COALESCE
# turns that NULL into raise_error. The oracles' HUGEINT raises on
# its own, so a breach fails loudly on BOTH engines instead of
# diverging as wrong-value/null-vs-error. A NULL {num} passes
# through as NULL (first WHEN); the pre-check over-triggers only at
# |quotient| exactly int64max with a nonzero remainder.
_SIGNED_DIV = (
    "CASE WHEN {num} IS NULL THEN NULL"
    " WHEN {scale} * CAST(abs({num}) AS DECIMAL(38,0))"
    " > CAST(9223372036854775807 AS DECIMAL(38,0)) * ({den}) THEN"
    " CAST(raise_error('{ctx}: scaled quotient past int64"
    " envelope') AS BIGINT)"
    " WHEN {num} >= 0 THEN"
    " COALESCE(CAST(({scale} * CAST({num} AS DECIMAL(38,0)))"
    " DIV {den} AS BIGINT),"
    " CAST(raise_error('{ctx}: scaled quotient past"
    " DECIMAL(38,0)/int64 envelope') AS BIGINT))"
    " ELSE -COALESCE(CAST(({scale} * CAST(-({num}) AS DECIMAL(38,0)))"
    " DIV {den} AS BIGINT),"
    " CAST(raise_error('{ctx}: scaled quotient past"
    " DECIMAL(38,0)/int64 envelope') AS BIGINT)) END"
)

# --------------------------------------------------------------- x195


def x195_residual_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer autocovariance profile (lags 0..7) of the lag-7
    seasonal-naive RESIDUALS r(t) = y(t) − y(t−7) of each event
    type's daily unit series — the x170 kernel on the x168
    forecaster's errors. ratio_permille is sign-handled (truncating
    toward zero in BOTH engines): a surviving ±spike at lag 7 means
    the weekly structure was NOT fully captured."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"ts_nanos DIV {NANOS_PER_DAY}").alias("t"),
        F.expr("CAST(round(value) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    lag7 = series.select(
        "event_type",
        (F.col("t") + 7).alias("t"),
        F.col("y").alias("y7"),
    )
    resid = series.join(lag7, ["event_type", "t"]).select(
        "event_type", "t", (F.col("y") - F.col("y7")).alias("r")
    )
    lags = F.explode(
        F.array(*[F.lit(k) for k in range(8)])
    ).alias("k")
    a = resid.select("event_type", "t", "r", lags)
    b = resid.select(
        "event_type",
        F.col("t").alias("tb"),
        F.col("r").alias("rb"),
    )
    paired = a.join(
        b,
        (a.event_type == b.event_type)
        & (F.col("tb") == F.col("t") + F.col("k")),
    ).select(a.event_type, "k", "r", "rb")
    cov = paired.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("r").alias("sa"),
        F.sum("rb").alias("sb"),
        F.sum(F.col("r") * F.col("rb")).alias("sab"),
    ).select(
        "event_type",
        F.col("k").cast("long").alias("k"),
        "n_pairs",
        (
            F.col("n_pairs") * F.col("sab")
            - F.col("sa") * F.col("sb")
        ).alias("cov_num"),
    )
    base = cov.filter(F.col("k") == 0).select(
        "event_type", F.col("cov_num").alias("cov0")
    )
    return (
        cov.join(base, "event_type")
        .select(
            "event_type",
            "k",
            "n_pairs",
            "cov_num",
            F.expr(
                "CASE WHEN cov0 > 0 THEN "
                + _SIGNED_DIV.format(
                    num="cov_num", den="cov0", scale="1000",
                    ctx="x195",
                )
                + " END"
            ).alias("ratio_permille"),
        )
        .orderBy("event_type", "k")
    )


ORACLE_X195 = f"""
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // {NANOS_PER_DAY} AS t,
           CAST(sum(CAST(round(value) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
resid AS (
    SELECT a.event_type, a.t, a.y - b.y AS r
    FROM series a
    JOIN series b ON b.event_type = a.event_type
                 AND b.t = a.t - 7
),
lagk AS (SELECT unnest(generate_series(0, 7)) AS k),
paired AS (
    SELECT a.event_type, l.k, a.r AS ra, b.r AS rb
    FROM resid a
    CROSS JOIN lagk l
    JOIN resid b ON b.event_type = a.event_type
                AND b.t = a.t + l.k
),
cov AS (
    SELECT event_type, CAST(k AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) AS BIGINT)
               * CAST(sum(ra * rb) AS BIGINT)
               - CAST(sum(ra) AS BIGINT)
               * CAST(sum(rb) AS BIGINT) AS cov_num
    FROM paired GROUP BY 1, 2
),
base AS (
    SELECT event_type, cov_num AS cov0 FROM cov WHERE k = 0
)
SELECT c.event_type, c.k, c.n_pairs, c.cov_num,
       CASE WHEN b.cov0 > 0 THEN
           CASE WHEN c.cov_num >= 0 THEN
               CAST((1000 * CAST(c.cov_num AS HUGEINT)) // b.cov0
                    AS BIGINT)
           ELSE -CAST((1000 * CAST(-(c.cov_num) AS HUGEINT))
                    // b.cov0 AS BIGINT)
           END END AS ratio_permille
FROM cov c JOIN base b ON b.event_type = c.event_type
ORDER BY c.event_type, c.k
"""

# --------------------------------------------------------------- x196


def x196_discount_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-brand exact OLS components of unit quantity on discount
    permille: n, sums, and the rational slope (slope_num = n·Σxy −
    Σx·Σy over slope_den = n·Σx² − (Σx)²) with a sign-handled ppm —
    positive means discounting moves volume for that brand. One
    fact-side keyed aggregate after a broadcast dimension join; the
    x92 leave-it-rational precedent."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(round(l_discount * 1000) AS BIGINT)"
        ).alias("x"),
        F.expr("CAST(round(l_quantity) AS BIGINT)").alias("y"),
    )
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    joined = li.join(
        F.broadcast(parts),
        li.l_partkey == parts.p_partkey,
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            "p_brand",
            "n",
            "sx",
            "sy",
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .alias("slope_num"),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .alias("slope_den"),
            F.expr(
                "CASE WHEN (n * sxx - sx * sx) > 0 THEN "
                + _SIGNED_DIV.format(
                    num="(n * sxy - sx * sy)",
                    den="(n * sxx - sx * sx)",
                    scale="1000000",
                    ctx="x196",
                )
                + " END"
            ).alias("slope_ppm"),
        )
        .orderBy("p_brand")
    )


ORACLE_X196 = """
WITH j AS (
    SELECT p.p_brand,
           CAST(round(l.l_discount * 1000) AS BIGINT) AS x,
           CAST(round(l.l_quantity) AS BIGINT) AS y
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
agg AS (
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM j GROUP BY p_brand
)
SELECT p_brand, n, sx, sy,
       n * sxy - sx * sy AS slope_num,
       n * sxx - sx * sx AS slope_den,
       CASE WHEN (n * sxx - sx * sx) > 0 THEN
           CASE WHEN (n * sxy - sx * sy) >= 0 THEN
               CAST((1000000 * CAST(n * sxy - sx * sy AS HUGEINT))
                   // (n * sxx - sx * sx) AS BIGINT)
           ELSE -CAST((1000000 * CAST(-(n * sxy - sx * sy)
                        AS HUGEINT))
                   // (n * sxx - sx * sx) AS BIGINT)
           END END AS slope_ppm
FROM agg ORDER BY p_brand
"""

# --------------------------------------------------------------- x197


def x197_weekend_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekday-vs-weekend daily-volume shift per event type, as exact
    Welch sufficient statistics (epoch day 0 = Thursday, so weekend
    ≡ day mod 7 ∈ {{2, 3}} in both engines): per side n, Σy, Σy², and
    the sign-handled mean-difference in volume permille —
    meandiff_pm = 1000·(Σ_we·n_wd − Σ_wd·n_we) DIV (n_wd·n_we)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"ts_nanos DIV {NANOS_PER_DAY}").alias("t"),
        F.expr("CAST(round(value) AS BIGINT)").alias("q"),
    )
    daily = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    ).withColumn(
        "is_we", F.expr("t % 7 IN (2, 3)")
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.sum(
                F.when(~F.col("is_we"), 1).otherwise(0)
            ).cast("long").alias("n_wd"),
            F.sum(
                F.when(F.col("is_we"), 1).otherwise(0)
            ).cast("long").alias("n_we"),
            F.sum(
                F.when(~F.col("is_we"), F.col("y")).otherwise(0)
            ).alias("sum_wd"),
            F.sum(
                F.when(F.col("is_we"), F.col("y")).otherwise(0)
            ).alias("sum_we"),
            F.sum(
                F.when(~F.col("is_we"), F.col("y") * F.col("y"))
                .otherwise(0)
            ).alias("ss_wd"),
            F.sum(
                F.when(F.col("is_we"), F.col("y") * F.col("y"))
                .otherwise(0)
            ).alias("ss_we"),
        )
        .select(
            "event_type",
            "n_wd",
            "n_we",
            "sum_wd",
            "sum_we",
            "ss_wd",
            "ss_we",
            F.expr(
                "CASE WHEN n_wd > 0 AND n_we > 0 THEN "
                + _SIGNED_DIV.format(
                    num="(sum_we * n_wd - sum_wd * n_we)",
                    den="(n_wd * n_we)",
                    scale="1000",
                    ctx="x197",
                )
                + " END"
            ).alias("meandiff_pm"),
        )
        .orderBy("event_type")
    )


ORACLE_X197 = f"""
WITH daily AS (
    SELECT event_type,
           epoch_ns(ts) // {NANOS_PER_DAY} AS t,
           CAST(sum(CAST(round(value) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
marked AS (
    SELECT event_type, y, (t % 7) IN (2, 3) AS is_we FROM daily
),
agg AS (
    SELECT event_type,
           CAST(sum(CASE WHEN NOT is_we THEN 1 ELSE 0 END)
                AS BIGINT) AS n_wd,
           CAST(sum(CASE WHEN is_we THEN 1 ELSE 0 END)
                AS BIGINT) AS n_we,
           CAST(sum(CASE WHEN NOT is_we THEN y ELSE 0 END)
                AS BIGINT) AS sum_wd,
           CAST(sum(CASE WHEN is_we THEN y ELSE 0 END)
                AS BIGINT) AS sum_we,
           CAST(sum(CASE WHEN NOT is_we THEN y * y ELSE 0 END)
                AS BIGINT) AS ss_wd,
           CAST(sum(CASE WHEN is_we THEN y * y ELSE 0 END)
                AS BIGINT) AS ss_we
    FROM marked GROUP BY event_type
)
SELECT event_type, n_wd, n_we, sum_wd, sum_we, ss_wd, ss_we,
       CASE WHEN n_wd > 0 AND n_we > 0 THEN
           CASE WHEN (sum_we * n_wd - sum_wd * n_we) >= 0 THEN
               CAST((1000 * CAST(sum_we * n_wd - sum_wd * n_we
                        AS HUGEINT))
                   // (n_wd * n_we) AS BIGINT)
           ELSE -CAST((1000 * CAST(-(sum_we * n_wd - sum_wd * n_we)
                        AS HUGEINT))
                   // (n_wd * n_we) AS BIGINT)
           END END AS meandiff_pm
FROM agg ORDER BY event_type
"""


# --------------------------------------------------------------- x203

N_BUCKETS = 64


def x203_bucket_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash-bucket balance certificate — the audit you run BEFORE
    committing a 100 TB ``bucketBy`` layout: for two candidate
    bucketing keys over events (user_id: high-cardinality, should
    spread; event_type: 5 values, a deliberately bad key the
    certificate must flag), the full 64-bucket occupancy grid under
    the engine's own h64 hash, with per-bucket share_ppm.

    Empty buckets appear as zero rows (a key that leaves 59 of 64
    buckets empty reads directly off the grid — exactly what
    event_type does), so the output is a fixed 2×64 grid whatever the
    corpus. Counts are one map-side-combining hash aggregate per key;
    the constant 64-row spine attaches by broadcast. h64 is the
    engine's md5-based 60-bit hash (``functions/text.py``) — the same
    deterministic value in Spark, DuckDB, and the bucket-pruning
    planner, so the certificate measures the REAL layout, not a
    lookalike hash.

    Reference parity: no storage-layout tooling in the reference;
    engine extension (SURVEY §2 sources/layout family beside x26/x29
    shard packing).
    """
    from m5_competition_kaggle_spark.functions.text import h64

    ev = load_table(spark, sf_dir, "events")
    spine = spark.range(N_BUCKETS).select(
        F.col("id").cast("long").alias("bucket")
    )
    keys = []
    for key_name, col in (
        ("user_id", F.col("user_id").cast("string")),
        ("event_type", F.col("event_type")),
    ):
        counts = (
            ev.select(
                (h64(col) % F.lit(N_BUCKETS)).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        grid = (
            spine.join(counts, "bucket", "left")
            .select(
                F.lit(key_name).alias("key_name"),
                "bucket",
                F.coalesce(F.col("n"), F.lit(0))
                .cast("long")
                .alias("n_events"),
            )
        )
        keys.append(grid)
    out = keys[0].unionAll(keys[1])
    # total as a broadcast 1-row aggregate: keeps the plan lazy (no
    # driver-side count at build time) and the merge is the allowed
    # 1-row global-aggregate SinglePartition exchange.
    tot = ev.agg(F.count(F.lit(1)).alias("__tot"))
    return (
        out.crossJoin(F.broadcast(tot))
        .select(
            "key_name",
            "bucket",
            "n_events",
            F.expr(
                "CASE WHEN __tot > 0 THEN"
                " (1000000 * n_events) DIV __tot END"
            ).alias("share_ppm"),
        )
        .orderBy("key_name", "bucket")
    )


ORACLE_X203 = f"""
WITH tot AS (SELECT count(*) AS t FROM events),
spine AS (SELECT k.key_name, r.range AS bucket
          FROM range(0, {N_BUCKETS}) r
          CROSS JOIN (SELECT 'user_id' AS key_name
                      UNION ALL SELECT 'event_type') k),
hashed AS (
    SELECT 'user_id' AS key_name,
           CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                AS BIGINT) % {N_BUCKETS} AS bucket
    FROM events
    UNION ALL
    SELECT 'event_type',
           CAST('0x' || substr(md5(event_type), 1, 15)
                AS BIGINT) % {N_BUCKETS}
    FROM events),
counts AS (SELECT key_name, bucket, count(*) AS n
           FROM hashed GROUP BY key_name, bucket)
SELECT s.key_name, s.bucket,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_events,
       CASE WHEN tot.t > 0 THEN
           (1000000 * CAST(coalesce(c.n, 0) AS BIGINT)) // tot.t
       END AS share_ppm
FROM spine s
LEFT JOIN counts c
  ON c.key_name = s.key_name AND c.bucket = s.bucket
CROSS JOIN tot
ORDER BY s.key_name, s.bucket
"""


# --------------------------------------------------------------- x204


def x204_join_cardinality_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pre-join cardinality audit for orders ⋈ customer on custkey —
    the one-row certificate a 100 TB join plan should be gated on:
    key overlap (how much of each side actually matches), per-key
    fan-out extremes, and the EXACT join output size
    Σ cnt_l·cnt_r over shared keys — before paying the shuffle.

    Everything reduces from the two per-key count tables (one hash
    aggregate per side, map-side combining), joined full-outer on the
    key: |keys| rows of bookkeeping regardless of fact-table width.
    est_output_rows sums cnt_l·cnt_r in DECIMAL(38,0) (two
    corpus-growing counts multiply — the r12 overflow class) and
    casts back to BIGINT inside the documented envelope (raises
    loudly under ANSI beyond it; the oracle's HUGEINT ditto).

    Reference parity: the reference joins blindly (pandas merge);
    the audit is an engine extension (SURVEY §2 relational family
    beside J1–J4).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key")
    )
    lc = orders.groupBy("key").agg(
        F.count(F.lit(1)).alias("cnt_l")
    )
    rc = cust.groupBy("key").agg(F.count(F.lit(1)).alias("cnt_r"))
    both = lc.join(rc, "key", "full_outer").select(
        "key",
        F.coalesce("cnt_l", F.lit(0)).alias("cnt_l"),
        F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
    )
    dec = "decimal(38,0)"
    return both.agg(
        F.sum(F.when(F.col("cnt_l") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_left_keys"),
        F.sum(F.when(F.col("cnt_r") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_right_keys"),
        F.sum(
            F.when(
                (F.col("cnt_l") > 0) & (F.col("cnt_r") > 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_shared_keys"),
        F.sum(
            F.when(F.col("cnt_r") == 0, F.col("cnt_l")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("left_orphan_rows"),
        F.sum(
            F.when(F.col("cnt_l") == 0, F.col("cnt_r")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("right_orphan_rows"),
        F.max("cnt_l").alias("max_left_fanout"),
        F.max("cnt_r").alias("max_right_fanout"),
        F.sum(
            (F.col("cnt_l").cast(dec) * F.col("cnt_r").cast(dec))
        )
        .cast("long")
        .alias("est_output_rows"),
    )


ORACLE_X204 = """
WITH lc AS (SELECT o_custkey AS key, count(*) AS cnt_l
            FROM orders GROUP BY o_custkey),
rc AS (SELECT c_custkey AS key, count(*) AS cnt_r
       FROM customer GROUP BY c_custkey),
both_k AS (
    SELECT coalesce(lc.key, rc.key) AS key,
           coalesce(lc.cnt_l, 0) AS cnt_l,
           coalesce(rc.cnt_r, 0) AS cnt_r
    FROM lc FULL OUTER JOIN rc ON lc.key = rc.key)
SELECT CAST(sum(CASE WHEN cnt_l > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_left_keys,
       CAST(sum(CASE WHEN cnt_r > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_right_keys,
       CAST(sum(CASE WHEN cnt_l > 0 AND cnt_r > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shared_keys,
       CAST(sum(CASE WHEN cnt_r = 0 THEN cnt_l ELSE 0 END)
            AS BIGINT) AS left_orphan_rows,
       CAST(sum(CASE WHEN cnt_l = 0 THEN cnt_r ELSE 0 END)
            AS BIGINT) AS right_orphan_rows,
       max(cnt_l) AS max_left_fanout,
       max(cnt_r) AS max_right_fanout,
       CAST(sum(CAST(cnt_l AS HUGEINT) * cnt_r) AS BIGINT)
           AS est_output_rows
FROM both_k
"""


# --------------------------------------------------------------- x210


def x210_key_skew_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join/shuffle-key skew certificate — the measurement behind the
    salting decision (``operators/skew.py``) and AQE's skew-join
    threshold: for each candidate shuffle key over events (user_id:
    the real join key; event_type: a deliberately pathological
    5-value key), one row with the exact concentration readout —
    key count, max/mean frequency, skew_ppm = 10⁶·max·n_keys DIV
    n_rows (10⁶ = perfectly uniform; a hot key reads directly as its
    multiple of fair share) and hhi_ppm = 10⁶·Σcnt² DIV n_rows²
    (the Herfindahl concentration, 10⁶/n_keys at uniform, → 10⁶ as
    one key takes everything).

    Scale shape: one map-side-combining count per key column, then a
    1-row global aggregate of the count table — no windows, no
    sorts, no top-k; Σcnt² widens through DECIMAL(38,0) (two
    corpus-growing factors — the r12 overflow class) and n_rows² in
    the same transient. hhi_ppm's quotient is ppm-bounded (Σcnt² ≤
    n_rows²) so its DIV cannot wrap; skew_ppm's quotient is bounded
    only by 10⁶·n_keys (max_cnt ≤ n_rows cancels the denominator,
    not the key count), so it routes through the shared _SIGNED_DIV
    loud-envelope guard — a corpus past ~9.2·10¹² distinct keys
    raises instead of silently wrapping (ADVICE r13).
    Heavy-hitter IDENTITIES are deliberately out of scope —
    the CMS heavy-hitters family already certifies those; this is
    the one-row go/no-go number.

    Reference parity: engine extension (SURVEY §2 relational-audit
    family beside x203/x204).
    """
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    outs = []
    for key_name, col in (
        ("user_id", F.col("user_id").cast("string")),
        ("event_type", F.col("event_type")),
    ):
        counts = (
            ev.select(col.alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        agg = counts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
            F.sum(
                (F.col("cnt") * F.col("cnt")).cast(dec)
            ).alias("__sq"),
        ).select(
            F.lit(key_name).alias("key_name"),
            "n_keys",
            "n_rows",
            "max_cnt",
            F.expr("n_rows DIV n_keys").alias("mean_cnt"),
            F.expr(
                "CASE WHEN n_rows > 0 THEN "
                + _SIGNED_DIV.format(
                    num="CAST(max_cnt AS DECIMAL(38,0)) * n_keys",
                    den="CAST(n_rows AS DECIMAL(38,0))",
                    scale="1000000",
                    ctx="x210",
                )
                + " END"
            ).alias("skew_ppm"),
            F.expr(
                "CASE WHEN n_rows > 0 THEN CAST("
                " (CAST(1000000 AS DECIMAL(38,0)) * __sq)"
                " DIV (CAST(n_rows AS DECIMAL(38,0)) * n_rows)"
                " AS BIGINT) END"
            ).alias("hhi_ppm"),
        )
        outs.append(agg)
    return outs[0].unionAll(outs[1]).orderBy("key_name")


ORACLE_X210 = """
WITH keyed AS (
    SELECT 'user_id' AS key_name,
           CAST(user_id AS VARCHAR) AS k
    FROM events
    UNION ALL
    SELECT 'event_type', event_type FROM events
),
counts AS (SELECT key_name, k, CAST(count(*) AS BIGINT) AS cnt
           FROM keyed GROUP BY key_name, k)
SELECT key_name,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       max(cnt) AS max_cnt,
       CAST(sum(cnt) AS BIGINT) // CAST(count(*) AS BIGINT)
           AS mean_cnt,
       CASE WHEN sum(cnt) > 0 THEN CAST(
           (1000000 * CAST(max(cnt) AS HUGEINT) * count(*))
           // sum(cnt) AS BIGINT) END AS skew_ppm,
       CASE WHEN sum(cnt) > 0 THEN CAST(
           (1000000 * CAST(sum(cnt * cnt) AS HUGEINT))
           // (CAST(sum(cnt) AS HUGEINT) * sum(cnt)) AS BIGINT) END
           AS hhi_ppm
FROM counts
GROUP BY key_name
ORDER BY key_name
"""


# --------------------------------------------------------------- x215


def x215_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier certificate per event type: the
    lower median of the milli-quantized values, the median absolute
    deviation around it, and the count of values beyond 3·MAD — the
    scale-robust companion to x83's winsorized mean (whose trim
    fractions a heavy tail can still drag) and the robust
    alternative to a σ-based z-score (where the outliers inflate the
    σ that is supposed to catch them). All rank math is exact
    integer: medians are "smallest value whose cumulative count
    reaches ceil(n/2)" over the per-type VALUE HISTOGRAM, so the two
    window scans run over distinct-value rows — state bounded by the
    value RANGE (the operators/quantiles.py argument), not the
    corpus; the corpus itself is touched by exactly two map-side-
    combining aggregates (value counts, deviation counts).

    MAD = 0 (≥ half the mass on one value) makes the 3·MAD fence
    degenerate — every off-median value counts as an outlier, the
    standard behavior, pinned in the queue tests.

    Reference parity: engine extension (SURVEY §2 robust-stats
    family beside x83 winsorized mean / x52 exact quantiles).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    counts = ev.groupBy("event_type", "q").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_tot = Window.partitionBy("event_type")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = counts.select(
        "event_type",
        "q",
        "cnt",
        F.sum("cnt").over(w_tot).alias("n"),
        F.sum("cnt").over(w_cum).alias("cum"),
    )
    med = (
        with_cum.filter(
            F.col("cum") >= F.expr("(n + 1) DIV 2")
        )
        .groupBy("event_type", "n")
        .agg(F.min("q").alias("med_q"))
    )
    devs = (
        counts.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "n",
            "med_q",
            F.abs(F.col("q") - F.col("med_q")).alias("dev"),
            "cnt",
        )
        .groupBy("event_type", "n", "med_q", "dev")
        .agg(F.sum("cnt").alias("dcnt"))
    )
    w_dcum = (
        Window.partitionBy("event_type")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_dcum = devs.withColumn(
        "dcum", F.sum("dcnt").over(w_dcum)
    )
    mad = (
        with_dcum.filter(
            F.col("dcum") >= F.expr("(n + 1) DIV 2")
        )
        .groupBy("event_type", "n", "med_q")
        .agg(F.min("dev").alias("mad_q"))
    )
    out = (
        devs.select("event_type", "dev", "dcnt")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med_q", "mad_q")
        .agg(
            F.sum(
                F.when(
                    F.col("dev") > 3 * F.col("mad_q"),
                    F.col("dcnt"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("n_outliers")
        )
    )
    return out.select(
        "event_type",
        "n",
        "med_q",
        "mad_q",
        "n_outliers",
        F.expr(
            "CASE WHEN n > 0 THEN (1000000 * n_outliers) DIV n END"
        ).alias("outlier_ppm"),
    ).orderBy("event_type")


ORACLE_X215 = """
WITH q AS (
    SELECT event_type,
           CAST(round(value * 1000) AS BIGINT) AS q
    FROM events
),
counts AS (
    SELECT event_type, q, CAST(count(*) AS BIGINT) AS cnt
    FROM q GROUP BY event_type, q
),
with_cum AS (
    SELECT event_type, q, cnt,
           CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT)
               AS n,
           CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY q
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
    FROM counts
),
med AS (
    SELECT event_type, n, min(q) AS med_q
    FROM with_cum WHERE cum >= (n + 1) // 2
    GROUP BY event_type, n
),
devs AS (
    SELECT c.event_type, m.n, m.med_q,
           abs(c.q - m.med_q) AS dev,
           CAST(sum(c.cnt) AS BIGINT) AS dcnt
    FROM counts c JOIN med m ON m.event_type = c.event_type
    GROUP BY c.event_type, m.n, m.med_q, abs(c.q - m.med_q)
),
with_dcum AS (
    SELECT event_type, n, med_q, dev, dcnt,
           CAST(sum(dcnt) OVER (PARTITION BY event_type
                ORDER BY dev ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS dcum
    FROM devs
),
mad AS (
    SELECT event_type, n, med_q, min(dev) AS mad_q
    FROM with_dcum WHERE dcum >= (n + 1) // 2
    GROUP BY event_type, n, med_q
),
agg AS (
    SELECT d.event_type, m.n, m.med_q, m.mad_q,
           CAST(sum(CASE WHEN d.dev > 3 * m.mad_q
                    THEN d.dcnt ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM devs d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type, m.n, m.med_q, m.mad_q
)
SELECT event_type, n, med_q, mad_q, n_outliers,
       CASE WHEN n > 0 THEN (1000000 * n_outliers) // n END
           AS outlier_ppm
FROM agg ORDER BY event_type
"""


# --------------------------------------------------------------- x217


def x217_changepoint_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary-segmentation changepoint localization: for each event
    type's daily unit series, the single split that maximizes the
    two-segment variance reduction, scored as the exact-integer R²
    of the split in ppm — r2 = (m·f(k) − S²) / (m·Σy² − S²) with
    f(k) cross-multiplied to the common denominator k(m−k), so the
    whole score is one DECIMAL(38,0) ratio both engines floor
    identically (quotient ≤ 10⁶ since R² ≤ 1 — no DIV wrap
    possible). The WHERE of a level shift, complementing s23's
    streaming CUSUM (which says WHEN the monitor would alarm) and
    x181's runs test (which says IF the series trends at all).
    Constant series (zero total variance) emit a NULL score with the
    earliest candidate day — explicit NULLS LAST ordering keeps the
    argmax deterministic and identical cross-engine.

    Scale shape: one map-side-combining (type, day) aggregate, then
    per-type windows over DAY cells (calendar-bounded, partitioned
    by type — never a global window) and a per-type 1-row argmax.
    Envelope: m·S² and the 10⁶-scaled numerator stay inside
    DECIMAL(38,0) up to S ≈ 10¹⁵ units per type — ~10⁶× the
    100×-probe magnitude; ANSI raises loudly past it.

    Reference parity: engine extension (SURVEY §2 temporal family
    beside x170/x181/x195/x211; streaming twin s23).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"ts_nanos DIV {NANOS_PER_DAY}").alias("t"),
        F.expr("CAST(round(value) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    dec = "decimal(38,0)"
    w_tot = Window.partitionBy("event_type")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = series.select(
        "event_type",
        "t",
        F.count(F.lit(1)).over(w_tot).alias("m"),
        F.sum("y").over(w_tot).alias("s_tot"),
        F.sum(F.expr(f"CAST(y AS {dec}) * y"))
        .over(w_tot)
        .alias("ssq_tot"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("t")
        ).alias("k"),
        F.sum("y").over(w_cum).alias("s1"),
    )
    cand = scanned.filter(F.col("k") < F.col("m")).select(
        "event_type",
        "t",
        "m",
        "k",
        F.expr(
            "CASE WHEN CAST(m AS DECIMAL(38,0)) * ssq_tot"
            " - CAST(s_tot AS DECIMAL(38,0)) * s_tot > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) *"
            "  (CAST(m AS DECIMAL(38,0)) *"
            "   (CAST(s1 AS DECIMAL(38,0)) * s1 * (m - k)"
            "    + CAST(s_tot - s1 AS DECIMAL(38,0))"
            "      * (s_tot - s1) * k)"
            "   - CAST(s_tot AS DECIMAL(38,0)) * s_tot"
            "     * (CAST(k AS DECIMAL(38,0)) * (m - k))))"
            " DIV ((CAST(k AS DECIMAL(38,0)) * (m - k))"
            "      * (CAST(m AS DECIMAL(38,0)) * ssq_tot"
            "         - CAST(s_tot AS DECIMAL(38,0)) * s_tot))"
            " AS BIGINT) END"
        ).alias("r2_ppm"),
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.col("r2_ppm").desc_nulls_last(), F.col("t").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("m").alias("n_days"),
            F.col("t").alias("split_day"),
            F.col("k").alias("split_k"),
            "r2_ppm",
        )
        .orderBy("event_type")
    )


ORACLE_X217 = f"""
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // {NANOS_PER_DAY} AS t,
           CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY event_type, epoch_ns(ts) // {NANOS_PER_DAY}
),
scanned AS (
    SELECT event_type, t,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS m,
           CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT)
               AS s_tot,
           sum(CAST(y AS HUGEINT) * y)
               OVER (PARTITION BY event_type) AS ssq_tot,
           CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY t) AS BIGINT) AS k,
           CAST(sum(y) OVER (PARTITION BY event_type ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s1
    FROM series
),
cand AS (
    SELECT event_type, t, m, k,
           CASE WHEN CAST(m AS HUGEINT) * ssq_tot
                     - CAST(s_tot AS HUGEINT) * s_tot > 0 THEN
               CAST((1000000 *
                 (CAST(m AS HUGEINT) *
                  (CAST(s1 AS HUGEINT) * s1 * (m - k)
                   + CAST(s_tot - s1 AS HUGEINT)
                     * (s_tot - s1) * k)
                  - CAST(s_tot AS HUGEINT) * s_tot
                    * (CAST(k AS HUGEINT) * (m - k))))
               // ((CAST(k AS HUGEINT) * (m - k))
                   * (CAST(m AS HUGEINT) * ssq_tot
                      - CAST(s_tot AS HUGEINT) * s_tot))
               AS BIGINT) END AS r2_ppm
    FROM scanned WHERE k < m
),
best AS (
    SELECT event_type, t, m, k, r2_ppm,
           row_number() OVER (PARTITION BY event_type
               ORDER BY r2_ppm DESC NULLS LAST, t ASC) AS rn
    FROM cand
)
SELECT event_type, m AS n_days, t AS split_day, k AS split_k,
       r2_ppm
FROM best WHERE rn = 1 ORDER BY event_type
"""


QUERIES = {
    "x195_residual_acf": x195_residual_acf,
    "x196_discount_lift": x196_discount_lift,
    "x197_weekend_shift": x197_weekend_shift,
    "x203_bucket_balance": x203_bucket_balance,
    "x204_join_cardinality_audit": x204_join_cardinality_audit,
    "x210_key_skew_certificate": x210_key_skew_certificate,
    "x215_mad_outliers": x215_mad_outliers,
    "x217_changepoint_split": x217_changepoint_split,
}

ORACLES = {
    "x195_residual_acf": ORACLE_X195,
    "x196_discount_lift": ORACLE_X196,
    "x197_weekend_shift": ORACLE_X197,
    "x203_bucket_balance": ORACLE_X203,
    "x204_join_cardinality_audit": ORACLE_X204,
    "x210_key_skew_certificate": ORACLE_X210,
    "x215_mad_outliers": ORACLE_X215,
    "x217_changepoint_split": ORACLE_X217,
}
