"""Round-8 queue, sixth batch — linear algebra, ranking quality,
composition audit.

- x130 integer power-iteration PCA (``operators/pca_power.py``): the
  dominant principal direction of the embedding corpus from the exact
  int64 Gram matrix, three integer matvec+rescale rounds — iterative
  numerical linear algebra with a bit-exact unrolled SQL twin (the
  x41/x65 fixed-round precedent applied to eigenvectors). Shuffle
  volume is d² per partition for the Gram stage and O(d²) per round
  after, independent of corpus size.
- x131 ANN nDCG@10 (``operators/ranking_eval.py``): graded ranking
  quality of the IVF index vs the exact baseline — x116's recall
  twin that also penalizes order; discounts are shared compile-time
  literals, so no transcendental runs in either engine.
- x132 shard source-mix HHI (``operators/concentration.py``): the
  composition audit of packed shards — x119 plans the global mix,
  this certifies what each shard actually got.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.concentration import (
    group_hhi,
)
from m5_competition_kaggle_spark.operators.pca_power import (
    gram_matrix,
    power_iteration,
)
from m5_competition_kaggle_spark.operators.prefix import (
    pack_into_shards,
)
from m5_competition_kaggle_spark.operators.ranking_eval import (
    discounts,
    ndcg_at_k,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SHARD_BUDGET = 20_000


def x130_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the quantized embedding corpus:
    exact Gram, 3 integer power rounds, per-dimension permille
    loading."""
    emb = load_table(spark, sf_dir, "embeddings")
    gram = gram_matrix(emb, "embedding")
    return power_iteration(gram, rounds=3).orderBy("i")


def x131_ann_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the IVF approximate ranking (x23's machinery)
    against the exact top-10 relevance set (x9's) — recall tells you
    WHAT came back, this also grades WHERE it ranked."""
    from m5_competition_kaggle_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(emb, qset, k=10).select(
        "query_id",
        "neighbor_id",
        F.col("rank").alias("exact_rank"),
    )
    ivf = ivf_topk(
        emb, qset, k=10, nprobe=4, n_centroids=16
    ).select("query_id", "neighbor_id", "rank")
    return ndcg_at_k(ivf, exact, 10).orderBy("query_id")


def x132_shard_source_mix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-shard source concentration after char-budget packing
    (x26's deterministic shard assignment): HHI permille, class
    count, and the dominant source's share — the composition each
    shard ACTUALLY trains on."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    packed = pack_into_shards(
        docs, "n_chars", ("doc_id",), SHARD_BUDGET
    )
    return group_hhi(packed, "shard_id", "source").orderBy(
        "shard_id"
    )


def x133_gains_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile cumulative-gains/lift table of ranking the embedding
    corpus by its dot score against the label-0 integer centroid
    (x87's scoring statistic), positives = label 0. Does the
    prototype score concentrate its own class in the top deciles —
    the curation-threshold picker next to x112's calibration and
    x131's nDCG."""
    from m5_competition_kaggle_spark.operators.centroid import (
        centroid_sums,
    )
    from m5_competition_kaggle_spark.operators.gains import (
        lift_table,
    )
    from m5_competition_kaggle_spark.operators.similarity import (
        quantize_expr,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = centroid_sums(emb).filter(F.col("label") == 0)
    comps = emb.select(
        "vec_id",
        "label",
        F.posexplode(quantize_expr("embedding")).alias("pos", "q"),
    ).withColumn("pos", F.col("pos").cast("long"))
    scored = (
        comps.join(
            F.broadcast(cents.select("pos", "sum_q", "n_vectors")),
            "pos",
        )
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("q") * F.col("sum_q")).alias("__dot"),
            F.max("n_vectors").alias("__n0"),
        )
        .select(
            "vec_id",
            F.expr("__dot DIV __n0").alias("score"),
            (F.col("label") == 0).cast("int").alias("positive"),
        )
    )
    return lift_table(
        scored, "score", "positive", "vec_id", 10
    ).orderBy("bucket")


QUERIES = {
    "x130_pca_power": x130_pca_power,
    "x131_ann_ndcg": x131_ann_ndcg,
    "x132_shard_source_mix": x132_shard_source_mix,
    "x133_gains_lift": x133_gains_lift,
}

ORACLES: dict[str, str] = {}


def _ndcg_oracle(k: int) -> str:
    """Composes the certified x9 (exact) and x23 (IVF) oracle texts
    with the literal-discount nDCG pivot — the same compile-time
    floats the Spark side embeds (repr round-trips bit-exact)."""
    from m5_competition_kaggle_spark.operators.ranking_eval import (
        ideal_dcg_ladder,
    )
    from m5_competition_kaggle_spark.queries import (
        extensions,
        llm_curation,
    )

    exact_sql = extensions.ORACLES["x9_sim_topk"]
    ivf_sql = llm_curation.ORACLES["x23_sim_topk_ivf"]
    d = discounts(k)
    ladder = ideal_dcg_ladder(k)
    gcols = ",\n           ".join(
        f"CAST(sum(CASE WHEN rnk = {i + 1} THEN g ELSE 0 END)"
        f" AS BIGINT) AS g{i + 1}"
        for i in range(k)
    )
    dcg = " + ".join(
        f"coalesce(p.g{i + 1}, 0) * CAST({d[i]!r} AS DOUBLE)"
        for i in range(k)
    )
    cases = " ".join(
        f"WHEN n_rel = {m} THEN CAST({ladder[m - 1]!r} AS DOUBLE)"
        for m in range(1, k + 1)
    )
    idcg = "CASE " + cases + " END"
    return f"""
WITH exact AS MATERIALIZED (
    SELECT query_id, neighbor_id, "rank" AS exact_rank
    FROM ({exact_sql}) t
),
ivf AS MATERIALIZED (
    SELECT query_id, neighbor_id, "rank" AS rnk
    FROM ({ivf_sql}) t
),
marked AS (
    SELECT i.query_id, i.rnk,
           CASE WHEN e.exact_rank IS NOT NULL
                THEN {k + 1} - e.exact_rank ELSE 0 END AS g
    FROM ivf i
    LEFT JOIN exact e ON i.query_id = e.query_id
                     AND i.neighbor_id = e.neighbor_id
),
perq AS (
    SELECT query_id,
           {gcols},
           CAST(sum(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hit
    FROM marked GROUP BY query_id
),
nrel AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
    FROM exact GROUP BY query_id
),
-- query universe = ivf ∪ exact, mirroring the Spark side's full-outer
-- join: a query whose index returned zero rows still emits a row
-- (n_hit = 0, dcg = 0) instead of silently vanishing.
qids AS (
    SELECT query_id FROM ivf
    UNION
    SELECT query_id FROM exact
),
scored AS (
    SELECT q.query_id, coalesce(r.n_rel, 0) AS n_rel,
           coalesce(p.n_hit, 0) AS n_hit,
           {dcg} AS dcg
    FROM qids q
    LEFT JOIN perq p ON q.query_id = p.query_id
    LEFT JOIN nrel r ON q.query_id = r.query_id
)
SELECT query_id, n_rel, n_hit, dcg,
       {idcg} AS idcg,
       CASE WHEN n_rel > 0
            THEN CAST(round(1e6 * dcg / ({idcg})) AS BIGINT)
       END AS ndcg_ppm
FROM scored
ORDER BY query_id
"""


ORACLES["x131_ann_ndcg"] = _ndcg_oracle(10)

ORACLES["x132_shard_source_mix"] = f"""
WITH packed AS (
    SELECT doc_id, source,
           (CAST(sum(n_chars) OVER (ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_chars)
               // {SHARD_BUDGET} AS shard_id
    FROM documents
),
cells AS (
    SELECT shard_id, source, CAST(count(*) AS BIGINT) AS c
    FROM packed GROUP BY shard_id, source
),
ranked AS (
    SELECT shard_id, source, c,
           row_number() OVER (PARTITION BY shard_id
               ORDER BY c DESC, source ASC) AS rn
    FROM cells
),
agg AS (
    SELECT shard_id, CAST(sum(c) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(c * c) AS BIGINT) AS ss,
           max(CASE WHEN rn = 1 THEN source END) AS dom_class,
           CAST(max(CASE WHEN rn = 1 THEN c END) AS BIGINT)
               AS dom_c
    FROM ranked GROUP BY shard_id
)
SELECT shard_id, n, n_classes,
       (1000 * ss) // (n * n) AS hhi_permille,
       dom_class,
       (1000 * dom_c) // n AS dom_permille
FROM agg
ORDER BY shard_id
"""

ORACLES["x130_pca_power"] = """
WITH qv AS (
    SELECT list_transform(
               embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
           ) AS q
    FROM embeddings
),
cells AS MATERIALIZED (
    SELECT ia - 1 AS i, ja - 1 AS j,
           CAST(sum(q[ia] * q[ja]) AS BIGINT) AS g
    FROM qv,
         unnest(generate_series(1, len(q))) AS t1(ia),
         unnest(generate_series(1, len(q))) AS t2(ja)
    GROUP BY ia, ja
),
r1 AS MATERIALIZED (
    SELECT i, CAST(sum(g) AS BIGINT) AS v FROM cells GROUP BY i
),
m1 AS (SELECT max(abs(v)) AS m FROM r1),
n1 AS MATERIALIZED (
    SELECT i AS j, v // (m // 1000 + 1) AS v FROM r1, m1
),
r2 AS MATERIALIZED (
    SELECT c.i, CAST(sum(c.g * n.v) AS BIGINT) AS v
    FROM cells c JOIN n1 n ON c.j = n.j GROUP BY c.i
),
m2 AS (SELECT max(abs(v)) AS m FROM r2),
n2 AS MATERIALIZED (
    SELECT i AS j, v // (m // 1000 + 1) AS v FROM r2, m2
),
r3 AS MATERIALIZED (
    SELECT c.i, CAST(sum(c.g * n.v) AS BIGINT) AS v
    FROM cells c JOIN n2 n ON c.j = n.j GROUP BY c.i
),
m3 AS (SELECT max(abs(v)) AS m FROM r3)
SELECT i, v AS v_raw,
       CASE WHEN m > 0 THEN (1000 * v) // m END AS v_permille
FROM r3, m3
ORDER BY i
"""

ORACLES["x133_gains_lift"] = """
WITH qv AS (
    SELECT vec_id, label,
           list_transform(
               embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
           ) AS q
    FROM embeddings
),
cent AS (
    SELECT ia AS pos, CAST(sum(q[ia]) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n0
    FROM qv, unnest(generate_series(1, len(q))) AS t(ia)
    WHERE label = 0
    GROUP BY ia
),
scored AS (
    SELECT v.vec_id,
           CAST(sum(v.q[c.pos] * c.s) AS BIGINT)
               // max(c.n0) AS score,
           CAST(max(CASE WHEN v.label = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS positive
    FROM qv v, cent c
    GROUP BY v.vec_id
),
ranked AS (
    SELECT vec_id, score, positive,
           row_number() OVER (ORDER BY -score, vec_id) AS rnk
    FROM scored
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n_all,
           CAST(sum(positive) AS BIGINT) AS p_all
    FROM ranked
),
bucketed AS (
    SELECT ((rnk - 1) * 10) // t.n_all + 1 AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(positive) AS BIGINT) AS pos,
           max(t.n_all) AS n_all, max(t.p_all) AS p_all
    FROM ranked CROSS JOIN tot t
    GROUP BY 1
),
walked AS (
    SELECT bucket, n, pos,
           CAST(sum(n) OVER (ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
           CAST(sum(pos) OVER (ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
           n_all, p_all
    FROM bucketed
)
SELECT bucket, n, pos, cum_n, cum_pos,
       CASE WHEN p_all > 0
            THEN (1000 * cum_pos * n_all) // (cum_n * p_all)
       END AS lift_permille,
       CASE WHEN p_all > 0
            THEN (1000 * cum_pos) // p_all
       END AS capture_permille
FROM walked
ORDER BY bucket
"""


def x134_weighted_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact quantity-weighted price quartiles per return flag
    (``operators/weighted_quantile.py``): the weighted counterpart of
    g8's unweighted quantiles — each price counts with its shipped
    quantity's mass. Pure integer threshold comparisons on one
    grouped sort."""
    from m5_competition_kaggle_spark.operators.weighted_quantile import (
        weighted_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT)"
        ).alias("cents"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    return weighted_quantiles(
        li, ["l_returnflag"], "cents", "qty"
    ).orderBy("l_returnflag")


QUERIES["x134_weighted_quantiles"] = x134_weighted_quantiles

ORACLES["x134_weighted_quantiles"] = """
WITH li AS (
    SELECT l_returnflag,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
),
cells AS (
    SELECT l_returnflag, cents,
           CAST(sum(qty) AS BIGINT) AS w,
           CAST(count(*) AS BIGINT) AS n
    FROM li GROUP BY l_returnflag, cents
),
walked AS (
    SELECT l_returnflag, cents, n,
           CAST(sum(w) OVER (PARTITION BY l_returnflag
                ORDER BY cents ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumw,
           CAST(sum(w) OVER (PARTITION BY l_returnflag)
                AS BIGINT) AS w_all
    FROM cells
)
SELECT l_returnflag,
       CAST(sum(n) AS BIGINT) AS n,
       max(w_all) AS w_total,
       min(CASE WHEN cumw * 4 >= w_all * 1 THEN cents END)
           AS wq_1_4,
       min(CASE WHEN cumw * 2 >= w_all * 1 THEN cents END)
           AS wq_1_2,
       min(CASE WHEN cumw * 4 >= w_all * 3 THEN cents END)
           AS wq_3_4
FROM walked
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def x135_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing (``operators/holt.py``) of the
    per-event-type daily quantized value totals: final level, trend
    and the one-step-ahead forecast — the drift-following upgrade of
    s5's EWMA, integer recurrence end-to-end."""
    from m5_competition_kaggle_spark.operators.holt import (
        holt_level_trend,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_nanos DIV 86400000000000").alias("t"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    return holt_level_trend(
        series, "event_type", "t", "y"
    ).orderBy("event_type")


QUERIES["x135_holt_trend"] = x135_holt_trend

ORACLES["x135_holt_trend"] = """
WITH RECURSIVE series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(sum(CAST(round(value * 1000) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
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
)
SELECT n.event_type, n.n_points, r.l AS level, r.b AS trend,
       r.l + r.b AS forecast_next
FROM n_per n
JOIN rec r ON r.event_type = n.event_type
          AND r.idx = n.n_points
ORDER BY n.event_type
"""


def s20_stream_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of the streaming quantile trajectory
    (``streaming/quantile_monitor.py``): per-event-time-day exact
    p50/p95/p99 of the integer-quantized value. The identical
    ``day_bucket_counts`` plan (shared with the s18 KS monitor) runs
    as a watermarked tumbling-day streaming agg with the quantile
    assembly per trigger in foreachBatch (stream == batch proven in
    tests/test_streaming_quantiles.py); this certifies the batch
    side against DuckDB — the latency/score percentile dashboard
    feed."""
    from m5_competition_kaggle_spark.streaming.ks_monitor import (
        day_bucket_counts,
    )
    from m5_competition_kaggle_spark.streaming.quantile_monitor import (
        quantile_day_table,
    )

    ev = load_table(spark, sf_dir, "events")
    return quantile_day_table(day_bucket_counts(ev)).orderBy("day")


QUERIES["s20_stream_quantiles"] = s20_stream_quantiles

ORACLES["s20_stream_quantiles"] = """
WITH dc AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(round(value) AS BIGINT) AS q,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
walked AS (
    SELECT day, q,
           CAST(sum(c) OVER (PARTITION BY day ORDER BY q
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           CAST(sum(c) OVER (PARTITION BY day) AS BIGINT) AS n
    FROM dc
)
SELECT day, max(n) AS n,
       min(CASE WHEN cum * 1000 >= n * 500 THEN q END) AS q500,
       min(CASE WHEN cum * 1000 >= n * 950 THEN q END) AS q950,
       min(CASE WHEN cum * 1000 >= n * 990 THEN q END) AS q990
FROM walked
GROUP BY day
ORDER BY day
"""


def x136_funnel_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Strict-order view → click → purchase funnel
    (``operators/funnel.py``) per user cohort (user_id % 4): each
    step must land STRICTLY AFTER the previous one and within 24
    event-time hours of it — the dashboard form with real attrition
    (the unbounded funnel converges to 100% on any active user over
    a month window). Exact step counts plus conversion permilles."""
    from m5_competition_kaggle_spark.operators.funnel import (
        funnel_conversion,
        funnel_reach,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_nanos"
    )
    reach = funnel_reach(
        ev, "user_id", "event_type", "ts_nanos",
        ["view", "click", "purchase"],
        max_gap=86_400_000_000_000,
    ).withColumn("cohort", F.col("entity") % 4)
    return funnel_conversion(reach, "cohort", 3).orderBy("cohort")


QUERIES["x136_funnel_conversion"] = x136_funnel_conversion

ORACLES["x136_funnel_conversion"] = """
WITH ev AS (
    SELECT user_id, event_type, epoch_ns(ts) AS ts_nanos
    FROM events
),
entities AS (SELECT DISTINCT user_id FROM ev),
s1 AS (
    SELECT user_id, min(ts_nanos) AS t_1
    FROM ev WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts_nanos) AS t_2
    FROM ev e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts_nanos > s1.t_1
      AND e.ts_nanos <= s1.t_1 + 86400000000000
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts_nanos) AS t_3
    FROM ev e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts_nanos > s2.t_2
      AND e.ts_nanos <= s2.t_2 + 86400000000000
    GROUP BY e.user_id
),
reach AS (
    SELECT en.user_id % 4 AS cohort, s1.t_1, s2.t_2, s3.t_3
    FROM entities en
    LEFT JOIN s1 ON en.user_id = s1.user_id
    LEFT JOIN s2 ON en.user_id = s2.user_id
    LEFT JOIN s3 ON en.user_id = s3.user_id
)
SELECT cohort,
       CAST(count(*) AS BIGINT) AS n_entities,
       CAST(sum(CASE WHEN t_1 IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS reached_1,
       CAST(sum(CASE WHEN t_2 IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS reached_2,
       CAST(sum(CASE WHEN t_3 IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS reached_3,
       CASE WHEN sum(CASE WHEN t_1 IS NOT NULL THEN 1 ELSE 0 END)
                 > 0
            THEN CAST((1000 * sum(CASE WHEN t_2 IS NOT NULL
                                  THEN 1 ELSE 0 END))
                 // sum(CASE WHEN t_1 IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT)
       END AS conv_2_permille,
       CASE WHEN sum(CASE WHEN t_1 IS NOT NULL THEN 1 ELSE 0 END)
                 > 0
            THEN CAST((1000 * sum(CASE WHEN t_3 IS NOT NULL
                                  THEN 1 ELSE 0 END))
                 // sum(CASE WHEN t_1 IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT)
       END AS conv_3_permille
FROM reach
GROUP BY cohort
ORDER BY cohort
"""


def x137_ivf_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF codebook health (``operators/ivf_health.py``): per
    inverted list, exact assignment share and own-centroid
    coherence under the same deterministic rule x23/x116/x131
    probe — the balance/tightness audit that predicts probe cost
    skew before any query runs."""
    from m5_competition_kaggle_spark.operators.ivf_health import (
        ivf_health,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_health(emb, n_centroids=16).orderBy("cid")


QUERIES["x137_ivf_health"] = x137_ivf_health

ORACLES["x137_ivf_health"] = """
WITH qv AS (
    SELECT vec_id AS vid,
           list_transform(
               embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
           ) AS v
    FROM embeddings
),
cent AS (SELECT vid AS cid, v AS cv FROM qv WHERE vid < 16),
scored AS (
    SELECT q.vid, c.cid,
           CAST(list_sum(list_transform(
               generate_series(1, len(q.v)),
               i -> q.v[i] * c.cv[i])) AS BIGINT) AS cdot
    FROM qv q, cent c
),
asgn AS (
    SELECT vid, cid, cdot
    FROM (SELECT vid, cid, cdot,
                 row_number() OVER (PARTITION BY vid
                     ORDER BY cdot DESC, cid) AS rn
          FROM scored)
    WHERE rn = 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM asgn)
SELECT a.cid,
       CAST(count(*) AS BIGINT) AS n_assigned,
       (1000 * count(*)) // t.n AS share_permille,
       CAST(sum(a.cdot) AS BIGINT) AS sum_dot,
       CAST(sum(a.cdot) AS BIGINT) // count(*) AS mean_dot_q
FROM asgn a CROSS JOIN tot t
GROUP BY a.cid, t.n
ORDER BY a.cid
"""


def x138_rmsse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMSSE (the M5 competition metric, ``operators/rmsse.py``) of
    the engine's lag-7 naive forecaster (the ml/train.py stub's
    rule) on the per-event-type daily series — scaled by the naive
    one-step forecaster, exactly as M5 scores submissions. The
    evaluation loop the reference leaves implicit, closed with a
    bit-stable certificate (IEEE sqrt is correctly rounded)."""
    from m5_competition_kaggle_spark.operators.rmsse import rmsse
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_nanos DIV 86400000000000").alias("t"),
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("q"),
    )
    series = ev.groupBy("event_type", "t").agg(
        F.sum("q").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("t")
    scored = series.withColumn("yhat", F.lag("y", 7).over(w))
    return rmsse(
        scored, ["event_type"], "t", "y", "yhat"
    ).orderBy("event_type")


QUERIES["x138_rmsse"] = x138_rmsse

ORACLES["x138_rmsse"] = """
WITH series AS (
    SELECT event_type,
           epoch_ns(ts) // 86400000000000 AS t,
           CAST(sum(CAST(round(value * 1000) AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
lagged AS (
    SELECT event_type, t, y,
           lag(y, 7) OVER (PARTITION BY event_type ORDER BY t)
               AS yhat,
           lag(y, 1) OVER (PARTITION BY event_type ORDER BY t)
               AS prev
    FROM series
),
agg AS (
    SELECT event_type,
           CAST(sum(CASE WHEN yhat IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_scored,
           CAST(sum(CASE WHEN yhat IS NOT NULL
                         THEN (y - yhat) * (y - yhat)
                         ELSE 0 END) AS BIGINT) AS sse,
           CAST(sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_scale,
           CAST(sum(CASE WHEN prev IS NOT NULL
                         THEN (y - prev) * (y - prev)
                         ELSE 0 END) AS BIGINT) AS scale_sse
    FROM lagged GROUP BY event_type
)
SELECT event_type, n_scored, sse, n_scale, scale_sse,
       CASE WHEN n_scored > 0 AND n_scale > 0 AND scale_sse > 0
            THEN CAST(round(1e6 * sqrt(
                 (CAST(sse AS DOUBLE) / n_scored)
                 / (CAST(scale_sse AS DOUBLE) / n_scale)))
                 AS BIGINT)
       END AS rmsse_ppm
FROM agg
ORDER BY event_type
"""
