"""Round-7 queue — built and locally certified during round 6; the r6
head-50 is fully booked (50 never-certified entries), so these register
at the tail and auto-promote into the r7 driver window.

New modules only (operators/interval_keyed.py, bloom_join.py,
ngram_lm.py, streaming/anomaly_state.py) plus import-only composition
of certified operators.

- s14 pandas-kernel anomaly flags: the SAME trailing-window integer
  z-test as x85, computed by an ``applyInPandas`` grouped-map whose
  kernel is shared verbatim with the ``applyInPandasWithState``
  streaming form — certifying the Arrow-crossing implementation
  bit-equal to the pure-Catalyst one (the 4th streaming integration
  style: batch-certified stateful kernel).
- s15 attribution as a stream-shaped join-aggregate: x89's semantics
  via the streaming-legal equi-join + max(struct) formulation.
- x90 Kneser-Ney bigram components with d=1/2 as exact rationals.
- x91 equal-frequency (decile) binning profile — the quantile
  discretizer feature-engineering step.
- x92 cross-series correlation components over daily event counts.
- x93 linear multi-touch attribution via the KEYED interval join
  (the range-join class with an entity key — x67 generalized).
- x94 LSH dedup recall certificate: MinHash-LSH pairs vs the
  exhaustive baseline, counted and ratioed integer-exact.
- x95 bloom-filtered join pruning certified lossless (the runtime-
  filter pattern, with false-positive accounting).
- x96 partition manifest stats — the min/max/count table data-skipping
  readers prune by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.bloom_join import (
    bloom_bits,
    bloom_semi_filter,
)
from m5_competition_kaggle_spark.operators.interval_keyed import (
    interval_join_keyed,
)
from m5_competition_kaggle_spark.operators.ngram_lm import (
    kneser_ney_components,
)
from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.anomaly_state import (
    batch_anomaly_flags,
)

DAY_NANOS = 86_400_000_000_000
NANOS_PER_DAY = DAY_NANOS

# ----------------------------------------------------------------- queries


def s14_stateful_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x85's integer z-test through the pandas kernel
    (``streaming/anomaly_state.py``): proves the Arrow-crossing
    grouped-map — and therefore the stateful streaming twin sharing
    its kernel — produces exactly the SQL-certified flags."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type"),
        "event_id",
        F.col("ts_nanos").alias("tsn"),
        F.floor(F.col("value") * F.lit(1000)).cast("long").alias("v"),
    )
    flagged = batch_anomaly_flags(
        ev, "event_type", "v", order_cols=("tsn", "event_id"),
        window=50, min_n=10, z=3,
    )
    return (
        flagged.filter(F.col("is_anomaly"))
        .drop("is_anomaly")
        .orderBy("event_id")
    )


def s15_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution in the STREAM-LEGAL formulation: equi-join
    purchases to the static view table on user_id (fan-out bounded by
    per-user views), range filter, one max(struct) aggregate per
    purchase — the plan foreachBatch replays against live purchases.
    Same semantics as x89's union-window formulation, independently
    certified."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_nanos").alias("tsn")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts_nanos").alias("vtsn"))
        .agg(F.min("event_id").alias("view_event_id"))
    )
    matched = (
        purch.join(views, "user_id")
        .filter(
            (F.col("vtsn") <= F.col("tsn"))
            & (F.col("vtsn") >= F.col("tsn") - F.lit(DAY_NANOS))
        )
        .groupBy("event_id")
        .agg(F.max(F.struct("vtsn", "view_event_id")).alias("__m"))
    )
    return (
        purch.join(matched, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "tsn",
            F.col("__m.view_event_id").alias("attributed_view"),
            F.col("__m.vtsn").alias("attributed_tsn"),
        )
        .orderBy("event_id")
    )


def x90_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney bigram components (``operators/ngram_lm.py``):
    the d=1/2 smoothed probability as an exact int64 rational over
    four keyed aggregates — no float log-space arithmetic anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    return kneser_ney_components(docs, "text", top_n=100).orderBy(
        F.col("c12").desc(), "w1", "w2"
    )


def x91_eqfreq_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile profile per event type: ntile(10) over
    the milli-quantized value (deterministic under the (v, event_id)
    total order), then per-bin count/min/max — the quantile
    discretizer every feature pipeline runs, one grouped sort."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(1000)).cast("long").alias("v"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("v"), F.col("event_id")
    )
    return (
        ev.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .orderBy("event_type", "decile")
    )


def x92_cross_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series correlation components: daily counts per event
    type, then for every type pair the exact int64 sufficient sums
    and corr numerator / variance terms (corr = num/√(varx·vary),
    left rational so the hash certifies). Two keyed aggregates + a
    join on the 30-row day axis — the series tables are bounded by
    (types × days), never corpus-sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"ts_nanos DIV {NANOS_PER_DAY}").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("c")
    )
    a = daily.select(
        F.col("event_type").alias("type_a"), "day", F.col("c").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), "day", F.col("c").alias("y")
    )
    xy = a.join(b, "day").filter(F.col("type_a") < F.col("type_b"))
    return (
        xy.groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        .select(
            "type_a",
            "type_b",
            "n_days",
            "sx",
            "sy",
            "sxy",
            (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .alias("corr_num"),
            (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .alias("varx_n2"),
            (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy"))
            .alias("vary_n2"),
        )
        .orderBy("type_a", "type_b")
    )


def x93_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view within the day before
    a purchase shares the credit equally (micro-units, 10^6 DIV n).
    The purchase-window × view match runs through the KEYED interval
    join (``operators/interval_keyed.py``) — co-partitioned by
    (user, time-bucket), no per-user nested loop."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts_nanos").alias("vtsn"))
        .agg(F.min("event_id").alias("view_event_id"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        (F.col("ts_nanos") - F.lit(DAY_NANOS)).alias("w_start"),
        (F.col("ts_nanos") + F.lit(1)).alias("w_end"),
    )
    j = interval_join_keyed(
        views, purch, on=["user_id"], point_ts="vtsn",
        start_col="w_start", end_col="w_end", bucket_width=DAY_NANOS,
    )
    w = Window.partitionBy("p_event_id")
    credited = j.withColumn(
        "__n", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn("credit", F.expr("1000000 DIV __n"))
    return (
        credited.groupBy("view_event_id")
        .agg(
            F.sum("credit").alias("total_credit_micro"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
        .orderBy("view_event_id")
    )


def x94_dedup_eval(
    spark: SparkSession, sf_dir: str, sample_permille: int = 1000
) -> DataFrame:
    """Recall certificate for approximate dedup: MinHash-LSH pairs
    (x2's operator) counted against the exhaustive shingle-Jaccard
    baseline (x3's) at the same 0.8 threshold. LSH verifies Jaccard on
    its candidates, so precision is 1 by construction (tp = n_lsh —
    the query certifies that too by counting the intersection);
    recall_permille = 1000·tp DIV n_exact.

    The exhaustive flank is quadratic BY DEFINITION — it is the audit
    baseline. ``sample_permille`` (VERDICT r6 item 3) is the corpus-
    scale knob: below 1000 it keeps a deterministic hash-sample of
    documents and certifies recall on pairs whose BOTH endpoints
    survive, shrinking the flank by (p/1000)^2 while the estimate
    stays unbiased over pairs. The certified query keeps 1000 (exact,
    full corpus) — same shape as bloom_decontaminate(exact_audit=...).
    """
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    if not 0 < int(sample_permille) <= 1000:
        raise ValueError(
            f"sample_permille must be in (0, 1000], got {sample_permille}"
        )
    if int(sample_permille) < 1000:
        docs = docs.filter(
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(94)), F.lit(1000))
            < F.lit(int(sample_permille))
        )
    # r15: both pair tables feed TWO consumers each (the tp semi-join
    # and their own count) — without a cut the whole post-shingle LSH
    # pipeline and the whole exact quadratic flank replay per consumer
    # (guide §5; the x199 pairs convention). Both are pair tables,
    # far smaller than the corpus; partitioning kept (pair counts
    # scale with the corpus).
    lsh = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.8,
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    exact = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_size=3, threshold=0.8
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    tp = lsh.join(exact, ["id_a", "id_b"], "leftsemi")
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_tp = tp.agg(F.count(F.lit(1)).alias("tp"))
    return (
        n_lsh.join(F.broadcast(n_exact))
        .join(F.broadcast(n_tp))
        .select(
            "n_lsh",
            "n_exact",
            "tp",
            (F.col("n_exact") - F.col("tp")).alias("fn"),
            F.expr("(1000 * tp) DIV n_exact").alias("recall_permille"),
        )
    )


def x95_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filtered join pruning certified lossless
    (``operators/bloom_join.py``): urgent-order keys condense to ≤2·|K|
    broadcast bit positions, lineitem pre-filters map-side (no false
    negatives possible), the exact semi-join then yields EXACTLY the
    plain join's aggregate — with the bloom candidate count and false
    positives accounted in the same row."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * F.lit(1_000_000))
        .cast("long")
        .alias("price_micro"),
    )
    build = orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey").distinct()
    bits = bloom_bits(build, "o_orderkey")
    cand = bloom_semi_filter(li, bits, "l_orderkey")
    # r14: ONE pass over the bloom candidates — the exact semi-join
    # becomes a broadcast left join against the (distinct) build keys,
    # and candidate count / exact count / exact sum come out of the
    # same 1-row aggregate, instead of two probe subtrees (each a full
    # lineitem scan + double bloom hash) joined at the end.
    flagged = cand.join(
        F.broadcast(
            build.withColumnRenamed("o_orderkey", "l_orderkey")
            .withColumn("__hit", F.lit(1))
        ),
        "l_orderkey",
        "left",
    )
    return flagged.agg(
        F.count("__hit").alias("n_urgent_items"),
        F.sum(
            F.when(F.col("__hit").isNotNull(), F.col("price_micro"))
        ).alias("sum_price_micro"),
        F.count(F.lit(1)).alias("bloom_candidates"),
    ).select(
        "n_urgent_items",
        "sum_price_micro",
        "bloom_candidates",
        (F.col("bloom_candidates") - F.col("n_urgent_items")).alias(
            "bloom_fp"
        ),
    )


def x96_manifest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition manifest: per doc_id-range partition the min/max/count
    envelope a data-skipping reader prunes by (the Iceberg/Delta
    manifest shape; `sources/bucketing.py` writes the real layouts,
    this certifies the stats computation). One keyed aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("partition", F.expr("doc_id DIV 50"))
        .groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("partition")
    )


QUERIES = {
    "s14_stateful_anomaly": s14_stateful_anomaly,
    "s15_stream_attribution": s15_stream_attribution,
    "x90_kneser_ney": x90_kneser_ney,
    "x91_eqfreq_binning": x91_eqfreq_binning,
    "x92_cross_corr": x92_cross_corr,
    "x93_linear_attribution": x93_linear_attribution,
    "x94_dedup_eval": x94_dedup_eval,
    "x95_bloom_join": x95_bloom_join,
    "x96_manifest_stats": x96_manifest_stats,
}

# ----------------------------------------------------------------- oracles

_H64 = "CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"

ORACLES: dict[str, str] = {}

ORACLES["s14_stateful_anomaly"] = """
WITH ev AS (SELECT event_type, event_id, epoch_ns(ts) AS tsn,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v
            FROM events),
w AS (SELECT *,
             CAST(count(v) OVER f AS BIGINT) AS win_n,
             CAST(sum(v) OVER f AS BIGINT) AS win_sum,
             CAST(sum(v * v) OVER f AS BIGINT) AS ss
      FROM ev
      WINDOW f AS (PARTITION BY event_type ORDER BY tsn, event_id
                   ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
SELECT event_type AS "group", event_id, tsn, v, win_n, win_sum
FROM w
WHERE win_n >= 10
  AND (win_n * v - win_sum) * (win_n * v - win_sum)
      > 9 * (win_n * ss - win_sum * win_sum)
ORDER BY event_id
"""

ORACLES["s15_stream_attribution"] = f"""
WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS tsn
           FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, epoch_ns(ts) AS vtsn,
             min(event_id) AS view_event_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2),
m AS (SELECT p.event_id, max(v.vtsn) AS mvtsn
      FROM p JOIN v ON v.user_id = p.user_id
        AND v.vtsn <= p.tsn AND v.vtsn >= p.tsn - {DAY_NANOS}
      GROUP BY 1)
SELECT p.event_id AS event_id, p.user_id AS user_id, p.tsn AS tsn,
       v.view_event_id AS attributed_view,
       m.mvtsn AS attributed_tsn
FROM p
LEFT JOIN m ON m.event_id = p.event_id
LEFT JOIN v ON v.user_id = p.user_id AND v.vtsn = m.mvtsn
ORDER BY p.event_id
"""

ORACLES["x90_kneser_ney"] = """
WITH w0 AS (SELECT str_split_regex(trim(regexp_replace(lower(text),
                       '[^a-z]+', ' ', 'g')), ' +') AS ws
            FROM documents),
wl AS (SELECT ws FROM w0 WHERE len(ws) >= 2),
bg AS (SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
       FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM wl)),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
       FROM bg GROUP BY 1, 2),
lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1p_w1
        FROM bc GROUP BY 1),
rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont_w2
        FROM bc GROUP BY 1),
ty AS (SELECT CAST(count(*) AS BIGINT) AS types FROM bc),
top AS (SELECT w1, w2, c12 FROM
        (SELECT *, row_number() OVER (ORDER BY c12 DESC, w1, w2) AS r
         FROM bc)
        WHERE r <= 100)
SELECT t.w1, t.w2, t.c12, l.c1, l.n1p_w1, g.cont_w2, y.types,
       (2 * t.c12 - 1) * y.types + l.n1p_w1 * g.cont_w2 AS pkn_num,
       2 * l.c1 * y.types AS pkn_den
FROM top t
JOIN lft l ON l.w1 = t.w1
JOIN rgt g ON g.w2 = t.w2
CROSS JOIN ty y
ORDER BY t.c12 DESC, t.w1, t.w2
"""

ORACLES["x91_eqfreq_binning"] = """
WITH ev AS (SELECT event_type,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v,
                   event_id
            FROM events),
b AS (SELECT event_type, v,
             CAST(ntile(10) OVER (PARTITION BY event_type
                       ORDER BY v, event_id) AS BIGINT) AS decile
      FROM ev)
SELECT event_type, decile, CAST(count(*) AS BIGINT) AS n,
       min(v) AS min_v, max(v) AS max_v
FROM b GROUP BY 1, 2 ORDER BY event_type, decile
"""

ORACLES["x92_cross_corr"] = f"""
WITH daily AS (SELECT event_type,
                      epoch_ns(ts) // {NANOS_PER_DAY} AS day,
                      CAST(count(*) AS BIGINT) AS c
               FROM events GROUP BY 1, 2),
xy AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
              a.c AS x, b.c AS y
       FROM daily a JOIN daily b
         ON a.day = b.day AND a.event_type < b.event_type),
s AS (SELECT type_a, type_b,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM xy GROUP BY 1, 2)
SELECT type_a, type_b, n_days, sx, sy, sxy,
       n_days * sxy - sx * sy AS corr_num,
       n_days * sxx - sx * sx AS varx_n2,
       n_days * syy - sy * sy AS vary_n2
FROM s ORDER BY type_a, type_b
"""

ORACLES["x93_linear_attribution"] = f"""
WITH v AS (SELECT user_id, epoch_ns(ts) AS vtsn,
                  min(event_id) AS view_event_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
p AS (SELECT user_id, event_id AS p_event_id, epoch_ns(ts) AS tsn
      FROM events WHERE event_type = 'purchase'),
j AS (SELECT v.view_event_id, p.p_event_id
      FROM v JOIN p ON p.user_id = v.user_id
        AND v.vtsn >= p.tsn - {DAY_NANOS} AND v.vtsn <= p.tsn),
c AS (SELECT view_event_id, p_event_id,
             1000000 // CAST(count(*) OVER (PARTITION BY p_event_id)
                            AS BIGINT) AS credit
      FROM j)
SELECT view_event_id,
       CAST(sum(credit) AS BIGINT) AS total_credit_micro,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM c GROUP BY 1 ORDER BY view_event_id
"""


def _dedup_eval_oracle() -> str:
    from m5_competition_kaggle_spark.queries.extensions import (
        _minhash_verified_ctes,
    )

    return f"""
WITH {_minhash_verified_ctes(16, 4)},
lshp AS (SELECT id_a, id_b FROM vstats WHERE jaccard >= 0.8),
allc AS (SELECT e1.doc_id AS id_a, e2.doc_id AS id_b,
                count(*) AS n_common
         FROM sh e1 JOIN sh e2
           ON e2.shingle = e1.shingle AND e1.doc_id < e2.doc_id
         GROUP BY 1, 2),
exact AS (SELECT a.id_a, a.id_b FROM allc a
          JOIN sizes sa ON sa.doc_id = a.id_a
          JOIN sizes sb ON sb.doc_id = a.id_b
          WHERE a.n_common * 1.0
                / (sa.n_sh + sb.n_sh - a.n_common) >= 0.8),
cnt AS (SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM lshp) AS n_lsh,
    (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
    (SELECT CAST(count(*) AS BIGINT) FROM lshp l
     JOIN exact e ON e.id_a = l.id_a AND e.id_b = l.id_b) AS tp)
SELECT n_lsh, n_exact, tp, n_exact - tp AS fn,
       (1000 * tp) // n_exact AS recall_permille
FROM cnt
"""


ORACLES["x94_dedup_eval"] = _dedup_eval_oracle()

_B1 = _H64.format(s="'b1:' || CAST(o_orderkey AS VARCHAR)")
_B2 = _H64.format(s="'b2:' || CAST(o_orderkey AS VARCHAR)")
_P1 = _H64.format(s="'b1:' || CAST(l_orderkey AS VARCHAR)")
_P2 = _H64.format(s="'b2:' || CAST(l_orderkey AS VARCHAR)")

ORACLES["x95_bloom_join"] = f"""
WITH build AS (SELECT DISTINCT o_orderkey FROM orders
               WHERE o_orderpriority = '1-URGENT'),
bits AS (SELECT DISTINCT bit FROM (
    SELECT {_B1} % 16384 AS bit FROM build
    UNION ALL
    SELECT {_B2} % 16384 AS bit FROM build)),
li AS (SELECT l_orderkey,
              CAST(FLOOR(l_extendedprice * 1000000) AS BIGINT)
                  AS price_micro,
              {_P1} % 16384 AS p1,
              {_P2} % 16384 AS p2
       FROM lineitem),
cand AS (SELECT * FROM li
         WHERE p1 IN (SELECT bit FROM bits)
           AND p2 IN (SELECT bit FROM bits)),
ex AS (SELECT * FROM cand
       WHERE l_orderkey IN (SELECT o_orderkey FROM build)),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_urgent_items,
             CAST(sum(price_micro) AS BIGINT) AS sum_price_micro
      FROM ex),
c AS (SELECT CAST(count(*) AS BIGINT) AS bloom_candidates FROM cand)
SELECT a.n_urgent_items, a.sum_price_micro, c.bloom_candidates,
       c.bloom_candidates - a.n_urgent_items AS bloom_fp
FROM a CROSS JOIN c
"""

ORACLES["x96_manifest_stats"] = """
SELECT doc_id // 50 AS partition,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents GROUP BY 1 ORDER BY partition
"""
