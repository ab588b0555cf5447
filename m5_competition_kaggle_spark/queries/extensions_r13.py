"""Round-13 queue — STAGED UNREGISTERED, two rounds ahead (the r12
window is planned: persist-leak-fix stales + the r12 queue + re-bank
picks). Locally certified by ``tests/test_r13_queue.py`` with the
same Spark-vs-DuckDB differential as ``scripts/check_oracle.py``.

- x167 Heaps-law slope: the exponent β of V ≈ K·n^β fitted to
  x157's vocabulary-growth deciles by Theil–Sen in log-log space —
  quantized-log integers through the certified x153 median-pair
  kernel, so the certified outputs are the chosen pair's exact
  integers. One number that says whether the corpus grows types like
  natural language (β ≈ 0.5–0.8) or like serial-number junk (β → 1).
- x168 MASE (seasonal-naive m=7): the forecasting-standard scaled
  error beside x138's RMSSE — numerator the held-out last week under
  the lag-7 forecaster, denominator the in-sample seasonal-naive
  error, all exact integer µ-scaled arithmetic.
- x169 hierarchical reconciliation (M5's core structure): the root
  (all-types) Holt forecast vs the bottom-up sum of per-type Holt
  forecasts, and the top-down integer allocation of the root onto
  leaves by historical share — per-leaf coherence gaps, exact.
- x170 autocovariance profile: exact-integer lag-0..7 autocovariance
  ratios of each daily series — the seasonality/persistence
  diagnostic under x152's forecastability screen and x115's seasonal
  index (a lag-7 spike certifies weekly structure).
- s25 streaming MASE: the x168 metric as the THIRD assembly on the
  trend monitor's bounded (day, key) cells (changepoint = where it
  broke, Theil–Sen = where it's going, MASE = is the forecaster
  still adequate) — one streaming kernel, three certified readouts.
- s30 trailing-window Theil–Sen (added r12, after the 100× events
  probe): the bounded-pair scale path for s24 — only each key's most
  recent 28 days enter the pair set (≤378 pairs/key regardless of
  stream age), closing the measured quadratic-in-span growth of the
  unbounded assembly with certified code rather than a disclosure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import load_table

LOG_Q = 1_000_000  # quantized-log scale for x167

_INT64_MAX = "CAST(9223372036854775807 AS DECIMAL(38,0))"
# x169's guarded top-down allocation (see the inline comment at the
# call site for the three breach paths this makes loud). The abs()
# pre-check over-triggers only when |quotient| equals int64max
# exactly with a nonzero remainder — one value inside the envelope,
# documented rather than special-cased.
_X169_ALLOC = (
    "CASE WHEN hist_total > 0 THEN "
    "CASE WHEN abs(CAST(root_forecast AS DECIMAL(38,0)) * hist_leaf)"
    f" > {_INT64_MAX} * hist_total "
    "THEN CAST(raise_error("
    "'x169: alloc_topdown quotient past int64 envelope') AS BIGINT) "
    "ELSE COALESCE(CAST("
    "CAST(root_forecast AS DECIMAL(38,0)) * hist_leaf "
    "DIV hist_total AS BIGINT), CAST(raise_error("
    "'x169: alloc_topdown past DECIMAL(38,0) envelope') AS BIGINT))"
    " END END"
)

# --------------------------------------------------------------- x167


def x167_heaps_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps exponent β of the documents corpus: Theil–Sen slope of
    round(ln(types_cum)·10⁶) against round(ln(tokens_cum)·10⁶) over
    the ten x157 decile checkpoints. The log quantization makes the
    inputs exact integers (ln of a BIGINT is bit-identical in both
    engines on this platform — the x32/x63 raw-double precedent), so
    the x153 kernel's median-pair pick certifies exactly;
    slope_ppm ≈ β·10⁶. Plan note: the kernel runs under a CONSTANT
    series key (one corpus = one series), which Catalyst folds — the
    pair self-join plans as a cartesian of two 10-row sides and the
    rank window as a single partition holding 45 pairs; both are
    bounded BY CONSTRUCTION at any corpus size (x157 emits exactly
    one row per decile) and carry justified PLAN_AUDIT allowances."""
    from m5_competition_kaggle_spark.operators.heaps import (
        vocab_growth_deciles,
    )
    from m5_competition_kaggle_spark.operators.theil_sen import (
        theil_sen_slope,
    )

    docs = load_table(spark, sf_dir, "documents")
    dec = vocab_growth_deciles(docs)
    pts = dec.filter(
        (F.col("tokens_cum") > 0) & (F.col("types_cum") > 0)
    ).select(
        F.lit("corpus").alias("corpus"),
        F.expr(
            f"CAST(round(ln(tokens_cum) * {LOG_Q}) AS BIGINT)"
        ).alias("lt"),
        F.expr(
            f"CAST(round(ln(types_cum) * {LOG_Q}) AS BIGINT)"
        ).alias("ly"),
    )
    return theil_sen_slope(pts, "corpus", "lt", "ly")


ORACLE_X167 = """
WITH base AS (
    SELECT doc_id AS d,
           list_filter(regexp_split_to_array(lower(text),
                                             '[^a-z0-9]+'),
                       x -> x <> '') AS arr
    FROM documents
),
per_doc AS (
    SELECT d, CAST(len(arr) AS BIGINT) AS nt FROM base
),
tri AS (
    SELECT d, arr[u.i] || ' ' || arr[u.i + 1] || ' ' || arr[u.i + 2]
               AS ty
    FROM base, unnest(generate_series(1, len(arr) - 2)) AS u(i)
    WHERE len(arr) >= 3
),
first AS (
    SELECT ty, min(d) AS fd FROM tri GROUP BY ty
),
new_types AS (
    SELECT fd AS d, CAST(count(*) AS BIGINT) AS new_ty
    FROM first GROUP BY fd
),
cum AS (
    SELECT CAST(row_number() OVER (ORDER BY p.d) AS BIGINT) AS r,
           CAST(sum(p.nt) OVER (ORDER BY p.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS tokens_cum,
           CAST(sum(coalesce(n.new_ty, 0)) OVER (ORDER BY p.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS types_cum,
           CAST(count(*) OVER () AS BIGINT) AS n_docs
    FROM per_doc p LEFT JOIN new_types n ON n.d = p.d
),
cp AS (
    SELECT *,
           (10 * r + n_docs - 1) // n_docs AS decile,
           row_number() OVER (
               PARTITION BY (10 * r + n_docs - 1) // n_docs
               ORDER BY r DESC
           ) AS rn
    FROM cum
),
pts AS (
    SELECT CAST(round(ln(tokens_cum) * 1000000) AS BIGINT) AS lt,
           CAST(round(ln(types_cum) * 1000000) AS BIGINT) AS ly
    FROM cp WHERE rn = 1 AND tokens_cum > 0 AND types_cum > 0
),
pairs AS (
    SELECT a.lt AS ti, b.lt AS tj,
           b.ly - a.ly AS dy, b.lt - a.lt AS dx
    FROM pts a JOIN pts b ON a.lt < b.lt
),
ranked AS (
    SELECT dy, dx,
           row_number() OVER (
               ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) ASC,
                        ti ASC, tj ASC
           ) AS r,
           CAST(count(*) OVER () AS BIGINT) AS n_pairs
    FROM pairs
),
n_pts AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts)
SELECT 'corpus' AS corpus, p.n AS n, r.n_pairs AS n_pairs,
       r.dy AS slope_num, r.dx AS slope_den,
       CASE WHEN r.dy >= 0 THEN 1000000 * r.dy // r.dx
            ELSE -((1000000 * (-r.dy)) // r.dx) END AS slope_ppm
FROM n_pts p CROSS JOIN ranked r
WHERE r.r = (r.n_pairs + 1) // 2
"""

# --------------------------------------------------------------- x168


def x168_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE with the seasonal-naive (m=7) benchmark on the x138
    per-event-type daily permille-sum series: numerator the held-out
    LAST WEEK under the lag-7 forecaster, denominator the IN-SAMPLE
    seasonal-naive error — the forecasting-standard scaled metric
    beside RMSSE, all-integer (mase_ppm =
    10⁶·(sae_test/n_test)/(san_train/n_den) as one exact truncating
    quotient). Day pairs exist only where both t and t−7 have events
    (the fixture calendar is dense; a gap simply drops its pair in
    BOTH engines)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_nanos DIV 86400000000000").alias("t"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    lagged = series.alias("a").join(
        series.select(
            "event_type",
            (F.col("t") + 7).alias("t"),
            F.col("y").alias("ylag"),
        ).alias("b"),
        ["event_type", "t"],
    )
    tmax = series.groupBy("event_type").agg(
        F.max("t").alias("tmax")
    )
    marked = lagged.join(F.broadcast(tmax), "event_type").select(
        "event_type",
        F.abs(F.col("y") - F.col("ylag")).alias("ae"),
        (F.col("t") > F.col("tmax") - 7).alias("is_test"),
    )
    return (
        marked.groupBy("event_type")
        .agg(
            F.sum(F.when(~F.col("is_test"), 1).otherwise(0))
            .cast("long")
            .alias("n_den"),
            F.sum(F.when(F.col("is_test"), 1).otherwise(0))
            .cast("long")
            .alias("n_test"),
            F.sum(F.when(~F.col("is_test"), F.col("ae")).otherwise(0))
            .cast("long")
            .alias("san_train"),
            F.sum(F.when(F.col("is_test"), F.col("ae")).otherwise(0))
            .cast("long")
            .alias("sae_test"),
        )
        .select(
            "event_type",
            "n_den",
            "n_test",
            "san_train",
            "sae_test",
            F.expr(
                "CASE WHEN san_train > 0 AND n_test > 0 THEN "
                "(1000000 * sae_test * n_den) "
                "DIV (n_test * san_train) END"
            ).alias("mase_ppm"),
        )
        .orderBy("event_type")
    )


ORACLE_X168 = """
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(sum(CAST(round(value * 1000) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
lagged AS (
    SELECT a.event_type, a.t, abs(a.y - b.y) AS ae
    FROM series a
    JOIN series b ON b.event_type = a.event_type
                 AND b.t = a.t - 7
),
tm AS (
    SELECT event_type, max(t) AS tmax FROM series GROUP BY 1
),
marked AS (
    SELECT l.event_type, l.ae, l.t > m.tmax - 7 AS is_test
    FROM lagged l JOIN tm m ON m.event_type = l.event_type
),
agg AS (
    SELECT event_type,
           CAST(sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END)
                AS BIGINT) AS n_den,
           CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END)
                AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN NOT is_test THEN ae ELSE 0 END)
                AS BIGINT) AS san_train,
           CAST(sum(CASE WHEN is_test THEN ae ELSE 0 END)
                AS BIGINT) AS sae_test
    FROM marked GROUP BY event_type
)
SELECT event_type, n_den, n_test, san_train, sae_test,
       CASE WHEN san_train > 0 AND n_test > 0 THEN
           (1000000 * sae_test * n_den) // (n_test * san_train)
       END AS mase_ppm
FROM agg ORDER BY event_type
"""


# --------------------------------------------------------------- x169


def x169_hierarchy_reconcile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hierarchical forecast reconciliation — the M5 structure in
    miniature. Leaves are the per-event-type daily permille-sum
    series, the root their all-types total; BOTH levels forecast one
    step ahead with the certified x135 Holt recurrence (α=1/4,
    αβ=1/8). Certified per leaf: the leaf forecast, the top-down
    allocation of the root forecast by historical permille share
    (alloc = root_forecast·hist_leaf div hist_total), and the
    coherence gap alloc − leaf — plus the root-vs-bottom-up gap
    repeated on every row (bounded output: one row per type). A big
    |gap| says the hierarchy's levels disagree about tomorrow, the
    signal that picks top-down vs bottom-up reconciliation."""
    from m5_competition_kaggle_spark.operators.holt import (
        holt_level_trend,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_nanos DIV 86400000000000").alias("t"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    leaf_series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    root_series = leaf_series.groupBy("t").agg(
        F.sum("y").alias("y")
    ).select(F.lit("root").alias("k"), "t", "y")
    leaf_f = holt_level_trend(
        leaf_series, "event_type", "t", "y"
    ).select("event_type", "n_points", "forecast_next")
    root_f = F.broadcast(
        holt_level_trend(root_series, "k", "t", "y").select(
            F.col("forecast_next").alias("root_forecast")
        )
    )
    hist = leaf_series.groupBy("event_type").agg(
        F.sum("y").alias("hist_leaf")
    )
    tot = F.broadcast(
        hist.agg(F.sum("hist_leaf").alias("hist_total"))
    )
    bu = F.broadcast(
        leaf_f.agg(F.sum("forecast_next").alias("bottom_up"))
    )
    return (
        leaf_f.join(hist, "event_type")
        .crossJoin(root_f)
        .crossJoin(tot)
        .crossJoin(bu)
        .select(
            "event_type",
            "n_points",
            F.col("forecast_next").alias("leaf_forecast"),
            "hist_leaf",
            "root_forecast",
            # DECIMAL(38,0) intermediate, not BIGINT: hist sums grow
            # with calendar span, and the r12 100× events probe
            # measured root_forecast·hist_leaf PAST int64 (~1e20) at
            # an 8.5-year span — the product is exact to 1e38 here
            # and the quotient (≤ root_forecast) is cast back to
            # BIGINT. The DuckDB twin computes the same product in
            # HUGEINT with the full signed product trunc-divided
            # (DuckDB // floors, Spark DIV truncates toward zero on
            # ANY sign combination — no hist_leaf ≥ 0 precondition).
            # Loud-envelope guards (r12 ADVICE): three breach paths.
            # (1) product past DECIMAL(38,0): ANSI raises
            # NUMERIC_VALUE_OUT_OF_RANGE on its own (this session runs
            # ANSI); (2) quotient past int64: decimal DIV silently
            # WRAPS to a long EVEN UNDER ANSI (measured: int64max·10⁶
            # DIV 1 → −10⁶), so the abs() pre-check raises before the
            # wrapping DIV can produce a wrong value; (3) under a
            # non-ANSI deployment the casts NULL silently instead of
            # raising — the COALESCE turns that NULL into raise_error.
            # DuckDB's HUGEINT twin raises on its own, so a breach now
            # fails loudly on BOTH engines instead of diverging as
            # wrong-value/null-vs-error.
            F.expr(_X169_ALLOC).alias("alloc_topdown"),
            F.expr(f"{_X169_ALLOC} - forecast_next").alias("gap"),
            (F.col("root_forecast") - F.col("bottom_up")).alias(
                "root_minus_bottom_up"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_X169 = """
WITH RECURSIVE series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(sum(CAST(round(value * 1000) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
rootseries AS (
    SELECT t, CAST(sum(y) AS BIGINT) AS y FROM series GROUP BY t
),
indexed AS (
    SELECT event_type, y,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY t) AS idx
    FROM series
),
n_per AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
    FROM indexed GROUP BY event_type
),
rec AS (
    SELECT event_type, idx, y AS l, CAST(0 AS BIGINT) AS b
    FROM indexed WHERE idx = 1
    UNION ALL
    SELECT s.event_type, s.idx,
           r.l + r.b + (s.y - r.l - r.b) // 4,
           r.b + (s.y - r.l - r.b) // 8
    FROM rec r
    JOIN indexed s ON s.event_type = r.event_type
                  AND s.idx = r.idx + 1
),
leaf_f AS (
    SELECT n.event_type, n.n_points,
           r.l + r.b AS leaf_forecast
    FROM n_per n
    JOIN rec r ON r.event_type = n.event_type
              AND r.idx = n.n_points
),
rindexed AS (
    SELECT y, row_number() OVER (ORDER BY t) AS idx FROM rootseries
),
rn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rindexed),
rrec AS (
    SELECT idx, y AS l, CAST(0 AS BIGINT) AS b
    FROM rindexed WHERE idx = 1
    UNION ALL
    SELECT s.idx,
           r.l + r.b + (s.y - r.l - r.b) // 4,
           r.b + (s.y - r.l - r.b) // 8
    FROM rrec r JOIN rindexed s ON s.idx = r.idx + 1
),
root_f AS (
    SELECT r.l + r.b AS root_forecast
    FROM rrec r CROSS JOIN rn WHERE r.idx = rn.n
),
hist AS (
    SELECT event_type, CAST(sum(y) AS BIGINT) AS hist_leaf
    FROM series GROUP BY event_type
),
tot AS (SELECT CAST(sum(hist_leaf) AS BIGINT) AS hist_total
        FROM hist),
bu AS (SELECT CAST(sum(leaf_forecast) AS BIGINT) AS bottom_up
       FROM leaf_f)
SELECT f.event_type, f.n_points, f.leaf_forecast, h.hist_leaf,
       r.root_forecast,
       CASE WHEN t.hist_total > 0 THEN
           CASE WHEN CAST(r.root_forecast AS HUGEINT) * h.hist_leaf
                     >= 0 THEN CAST(
               CAST(r.root_forecast AS HUGEINT) * h.hist_leaf
               // t.hist_total AS BIGINT)
           ELSE -CAST(
               -(CAST(r.root_forecast AS HUGEINT) * h.hist_leaf)
               // t.hist_total AS BIGINT) END
       END AS alloc_topdown,
       CASE WHEN t.hist_total > 0 THEN
           CASE WHEN CAST(r.root_forecast AS HUGEINT) * h.hist_leaf
                     >= 0 THEN CAST(
               CAST(r.root_forecast AS HUGEINT) * h.hist_leaf
               // t.hist_total AS BIGINT)
           ELSE -CAST(
               -(CAST(r.root_forecast AS HUGEINT) * h.hist_leaf)
               // t.hist_total AS BIGINT) END
           - f.leaf_forecast
       END AS gap,
       r.root_forecast - b.bottom_up AS root_minus_bottom_up
FROM leaf_f f
JOIN hist h ON h.event_type = f.event_type
CROSS JOIN root_f r CROSS JOIN tot t CROSS JOIN bu b
ORDER BY f.event_type
"""

# --------------------------------------------------------------- x170


def x170_acf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer autocovariance profile, lags 0..7, of each
    event type's daily UNIT-value-sum series (round(value), not
    permille — the n²-scaled covariance numerator must stay inside
    int64). For the paired sample at lag k: cov_num_k =
    n_k·Σ(y_t·y_{t+k}) − (Σy_t)·(Σy_{t+k}), exact int64, and
    ratio_permille = 1000·cov_num_k div cov_num_0. Overflow
    contract (the x149 style): 1000·n_days²·max|y_day|² < 9.2·10¹⁸,
    i.e. n_days·max|y_day| < 3·10⁶·√1000 — holds to ~8 years of the
    fixture's daily mass; rescale y beyond. A lag-7 spike certifies
    weekly seasonality (the structure x115 indexes and x152's dow-η²
    screens); fast decay certifies mean reversion. Pairs exist where
    both t and t+k have events (dense fixture calendar)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_nanos DIV 86400000000000").alias("t"),
        F.expr("CAST(round(value) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    lags = F.explode(
        F.array(*[F.lit(k) for k in range(8)])
    ).alias("k")
    a = series.select("event_type", "t", "y", lags)
    b = series.select(
        "event_type",
        F.col("t").alias("tb"),
        F.col("y").alias("yb"),
    )
    paired = a.join(
        b,
        (a.event_type == b.event_type)
        & (F.col("tb") == F.col("t") + F.col("k")),
    ).select(a.event_type, "k", "y", "yb")
    cov = paired.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("y").alias("sa"),
        F.sum("yb").alias("sb"),
        F.sum(F.col("y") * F.col("yb")).alias("sab"),
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
                "1000 * cov_num DIV cov0 END"
            ).alias("ratio_permille"),
        )
        .orderBy("event_type", "k")
    )


ORACLE_X170 = """
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(sum(CAST(round(value) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
lagk AS (SELECT unnest(generate_series(0, 7)) AS k),
paired AS (
    SELECT a.event_type, l.k, a.y AS ya, b.y AS yb
    FROM series a
    CROSS JOIN lagk l
    JOIN series b ON b.event_type = a.event_type
                 AND b.t = a.t + l.k
),
cov AS (
    SELECT event_type, CAST(k AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) AS BIGINT)
               * CAST(sum(ya * yb) AS BIGINT)
               - CAST(sum(ya) AS BIGINT)
               * CAST(sum(yb) AS BIGINT) AS cov_num
    FROM paired GROUP BY 1, 2
),
base AS (
    SELECT event_type, cov_num AS cov0 FROM cov WHERE k = 0
)
SELECT c.event_type, c.k, c.n_pairs, c.cov_num,
       CASE WHEN b.cov0 > 0 THEN
           1000 * c.cov_num // b.cov0
       END AS ratio_permille
FROM cov c JOIN base b ON b.event_type = c.event_type
ORDER BY c.event_type, c.k
"""


# ---------------------------------------------------------------- s25


def s25_stream_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming MASE monitor: the same tumbling
    (day, event_type) cells s23/s24 maintain, through the x168
    seasonal-naive-scaled kernel — stream == batch is an arithmetic
    identity because the cells are exact integer day aggregates."""
    from m5_competition_kaggle_spark.streaming.trend_monitor import (
        day_key_cells,
        mase_from_cells,
    )

    ev = load_table(spark, sf_dir, "events")
    return mase_from_cells(day_key_cells(ev)).orderBy("key")


ORACLE_S25 = """
WITH cells AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type AS key,
           CAST(sum(CAST(round(value * 1000) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
lagged AS (
    SELECT a.key, a.day, abs(a.y - b.y) AS ae
    FROM cells a
    JOIN cells b ON b.key = a.key
                AND b.day = a.day - INTERVAL 7 DAY
),
tm AS (SELECT key, max(day) AS dmax FROM cells GROUP BY 1),
marked AS (
    SELECT l.key, l.ae,
           l.day > m.dmax - INTERVAL 7 DAY AS is_test
    FROM lagged l JOIN tm m ON m.key = l.key
),
agg AS (
    SELECT key,
           CAST(sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END)
                AS BIGINT) AS n_den,
           CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END)
                AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN NOT is_test THEN ae ELSE 0 END)
                AS BIGINT) AS san_train,
           CAST(sum(CASE WHEN is_test THEN ae ELSE 0 END)
                AS BIGINT) AS sae_test
    FROM marked GROUP BY key
)
SELECT key, n_den, n_test, san_train, sae_test,
       CASE WHEN san_train > 0 AND n_test > 0 THEN
           (1000000 * sae_test * n_den) // (n_test * san_train)
       END AS mase_ppm
FROM agg ORDER BY key
"""


def s30_windowed_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trailing-28-day Theil–Sen per key — the bounded-pair scale
    path for the s24 trend monitor (added after the r12 100× events
    probe measured the UNBOUNDED assembly at 146× wall over an
    8.5-year span: exact Theil–Sen is quadratic in calendar span by
    definition, so a long-lived monitor needs a trailing window —
    ≤ trailing² /2 pairs per key forever). Same certified median-pair
    kernel, same cells; only each key's most recent 28 days enter the
    pair set. On the ~30-day test corpus the window bites only keys
    whose first day precedes (max_day − 28) — the differential pins
    the boundary arithmetic, the 100× probe pins the bound."""
    from m5_competition_kaggle_spark.streaming.trend_monitor import (
        day_key_cells,
        theil_sen_from_cells_windowed,
    )

    ev = load_table(spark, sf_dir, "events")
    return theil_sen_from_cells_windowed(
        day_key_cells(ev), trailing_days=28
    ).orderBy("key")


ORACLE_S30 = """
WITH cells AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type AS key,
           CAST(sum(CAST(round(value * 1000) AS BIGINT))
                AS BIGINT) AS y_sum
    FROM events GROUP BY 1, 2
),
tm AS (SELECT key, max(day) AS dmax FROM cells GROUP BY 1),
recent AS (
    SELECT c.key, c.day, c.y_sum
    FROM cells c JOIN tm ON tm.key = c.key
    WHERE c.day > tm.dmax - INTERVAL 28 DAY
),
series AS (
    SELECT key,
           CAST(day - DATE '1970-01-01' AS BIGINT) AS t,
           y_sum AS y
    FROM recent
),
pairs AS (
    SELECT a.key, a.t AS ti, b.t AS tj,
           b.y - a.y AS dy, b.t - a.t AS dx
    FROM series a
    JOIN series b ON a.key = b.key AND a.t < b.t
),
ranked AS (
    SELECT key, dy, dx,
           row_number() OVER (
               PARTITION BY key
               ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) ASC,
                        ti ASC, tj ASC
           ) AS r,
           CAST(count(*) OVER (PARTITION BY key) AS BIGINT)
               AS n_pairs
    FROM pairs
),
n_pts AS (
    SELECT key, CAST(count(*) AS BIGINT) AS n
    FROM series GROUP BY 1
)
SELECT p.key AS key, p.n AS n, r.n_pairs AS n_pairs,
       r.dy AS slope_num, r.dx AS slope_den,
       CASE WHEN r.dy >= 0 THEN 1000000 * r.dy // r.dx
            ELSE -((1000000 * (-r.dy)) // r.dx) END AS slope_ppm
FROM n_pts p
JOIN ranked r ON r.key = p.key
             AND r.r = (r.n_pairs + 1) // 2
ORDER BY p.key
"""


QUERIES = {
    "x167_heaps_slope": x167_heaps_slope,
    "x168_mase": x168_mase,
    "x169_hierarchy_reconcile": x169_hierarchy_reconcile,
    "x170_acf_profile": x170_acf_profile,
    "s25_stream_mase": s25_stream_mase,
    "s30_windowed_trend": s30_windowed_trend,
}

ORACLES = {
    "x167_heaps_slope": ORACLE_X167,
    "x168_mase": ORACLE_X168,
    "x169_hierarchy_reconcile": ORACLE_X169,
    "x170_acf_profile": ORACLE_X170,
    "s25_stream_mase": ORACLE_S25,
    "s30_windowed_trend": ORACLE_S30,
}
