"""Round-8 queue, second batch — release-gate and data-QA certificates.

Registered BEHIND the r7 window (the head-50 is fully booked); these
certify locally this round and enter the r8 driver window with
x107–x109.

- x110 k-anonymity / l-diversity profile (``operators/privacy.py``):
  the structured-PII release gate — class-size histogram of the
  (nation, segment) quasi-identifier partition of customer with
  worst-case sensitive diversity, all exact int64.
- x111 Cohen's kappa (``operators/agreement.py``): chance-corrected
  agreement between two deterministic document raters (char-length
  bucket vs whitespace-token bucket); contingency + kappa as exact
  int64 rationals.
- x112 calibration reliability bins (``operators/calibration.py``):
  integer-permille score vs observed positive rate per bin, the
  pre-flight check before a score becomes a sampling weight.
- x113 local clustering coefficient (``operators/graph_coeff.py``):
  clique-vs-chain tightness per node of the MinHash near-dup graph,
  exact rational coefficients on x58's triangle machinery.
- x114 PSI drift (``operators/psi.py``): population stability index
  of the event-type mix, first half of January 2024 vs second —
  exact counts, psi_term as the shared double expression tree.
- x115 seasonal index: month-of-year revenue seasonality of orders
  as exact permille of the uniform-month baseline — the
  decomposition step before x101's drift detection is applied to
  deseasonalized series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.text import token_count
from m5_competition_kaggle_spark.operators.agreement import (
    kappa_contingency,
)
from m5_competition_kaggle_spark.operators.calibration import (
    calibration_bins,
)
from m5_competition_kaggle_spark.operators.graph_coeff import (
    local_clustering,
)
from m5_competition_kaggle_spark.operators.privacy import (
    k_anonymity_profile,
)
from m5_competition_kaggle_spark.operators.psi import psi_terms
from m5_competition_kaggle_spark.queries.extensions import (
    _minhash_verified_ctes,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

K_ANON = 10
# events span 2024-01-01..2024-01-31; split at 2024-01-16 00:00 UTC.
PSI_SPLIT_NS = 1_705_363_200_000_000_000

# ----------------------------------------------------------------- queries


def x110_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity class-size histogram of customer under the
    (c_nationkey, c_mktsegment) quasi-identifiers, sensitive =
    1000-unit account-balance bucket, k=10. One row per observed
    class size; the violating rows are exactly what a release would
    need to suppress or generalize."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_bucket",
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000)"
            " DIV 100000"
        ),
    )
    return (
        k_anonymity_profile(
            cust, ["c_nationkey", "c_mktsegment"], "bal_bucket", K_ANON
        )
        .select(
            "class_size", "n_classes", "n_rows", "min_ldiv",
            "violates_k",
        )
        .orderBy("class_size")
    )


def x111_rater_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document raters:
    rater A buckets by character length (n_chars DIV 120, capped at
    4), rater B by whitespace-token count (DIV 20, capped at 4).
    Output: the full contingency table with marginals plus the exact
    kappa rational (kappa_num / kappa_den) on every row."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("__tok", token_count("text"))
        .select(
            F.least(F.expr("n_chars DIV 120"), F.lit(4)).alias(
                "rater_a"
            ),
            F.least(F.expr("__tok DIV 20"), F.lit(4)).alias("rater_b"),
        )
    )
    return (
        kappa_contingency(docs, "rater_a", "rater_b")
        .select(
            "a", "b", "c_ab", "c_a", "c_b", "n",
            "kappa_num", "kappa_den", "kappa_permille",
        )
        .orderBy("a", "b")
    )


def x112_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table of l_discount (as an integer-permille
    'return-risk score') against the observed l_returnflag = 'R'
    rate, bin width 10 permille — the calibration audit shape; the
    measured gap_permille IS the finding."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        calibration_bins(
            li,
            F.expr("CAST(round(l_discount * 1000) AS BIGINT)"),
            F.col("l_returnflag") == F.lit("R"),
            bin_width=10,
        )
        .select(
            "bin", "n", "n_pos", "mean_score_permille",
            "pos_permille", "gap_permille",
        )
        .orderBy("bin")
    )


def x113_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per document over the MinHash
    near-dup graph (x2's operator, x58's edges): exact rational
    2T/(d(d-1)) separating collapse-safe duplicate cliques from
    chain-shaped transitive merges."""
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.8,
    ).select("id_a", "id_b")
    return (
        local_clustering(edges)
        .select(
            F.col("node").alias("doc_id"), "degree", "n_triangles",
            "coeff_num", "coeff_den", "coeff_permille",
        )
        .orderBy("doc_id")
    )


def x114_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of the event-type distribution, first vs second half of
    the events window. Counts exact; psi_term the shared double
    expression tree (x107 precedent); categories missing from either
    half surface as NULL terms instead of being smoothed away."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts_nanos"
    )
    ref = ev.filter(F.col("ts_nanos") < F.lit(PSI_SPLIT_NS))
    cmp_w = ev.filter(F.col("ts_nanos") >= F.lit(PSI_SPLIT_NS))
    return (
        psi_terms(ref, cmp_w, "event_type")
        .select(
            F.col("cat").alias("event_type"),
            "c_ref", "c_cmp", "n_ref", "n_cmp", "psi_term",
        )
        .orderBy("event_type")
    )


def x115_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year revenue seasonality of orders: exact cents sums
    and the seasonal index as permille of the uniform-month baseline
    (1000 = an average month). The decomposition step that precedes
    drift detection on deseasonalized series."""
    o = load_table(spark, sf_dir, "orders").select(
        F.month("o_orderdate").alias("month"),
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT)"
        ).alias("cents"),
    )
    monthly = o.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("rev_cents"),
    )
    totals = monthly.agg(
        F.sum("rev_cents").alias("rev_total_cents")
    )
    return (
        monthly.crossJoin(F.broadcast(totals))
        .withColumn(
            "seasonal_permille",
            F.expr("(1000 * 12 * rev_cents) DIV rev_total_cents"),
        )
        .select(
            "month", "n_orders", "rev_cents", "rev_total_cents",
            "seasonal_permille",
        )
        .orderBy("month")
    )


def s17_stream_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming PSI trajectory
    (``streaming/psi_monitor.py``): per-event-time-day population
    stability of the event-type mix against the frozen first-half
    reference. The identical ``day_category_counts`` plan runs as a
    watermarked tumbling-day streaming agg with the assembly per
    trigger in foreachBatch (stream == batch proven in
    tests/test_streaming_psi.py); this query certifies the batch side
    against DuckDB. Where x114 answers 'did the window drift' once,
    this is the day-by-day monitor feed."""
    from m5_competition_kaggle_spark.streaming.psi_monitor import (
        day_category_counts,
        psi_day_table,
    )

    ev = load_table(spark, sf_dir, "events")
    ref_counts = (
        ev.filter(F.col("ts_nanos") < F.lit(PSI_SPLIT_NS))
        .groupBy(F.col("event_type").alias("cat"))
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    days = day_category_counts(ev, since_nanos=PSI_SPLIT_NS)
    return (
        psi_day_table(days, ref_counts)
        .withColumnRenamed("cat", "event_type")
        .orderBy("day", "event_type")
    )


def x116_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall certificate — the eval harness for the similarity
    stack (x94's twin on the embedding side): recall@10 of the IVF
    (x23) and LSH (x10) approximate top-k against the exact block-
    matmul baseline (x9), per query, as exact integer overlap counts.
    Every branch is the already-certified deterministic machinery, so
    the RECALL ITSELF hash-certifies — the number a production tuning
    loop (nprobe / num_tables) would optimize."""
    from m5_competition_kaggle_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(emb, qset, k=10).select(
        "query_id", "neighbor_id"
    )
    approx = {
        "ivf": ivf_topk(emb, qset, k=10, nprobe=4, n_centroids=16),
        "lsh": lsh_topk(
            emb, qset, k=10, num_planes=4, num_tables=8, dim=64,
            # qset ⊂ corpus by this predicate → one bucketize Arrow
            # pass instead of two (r15, guide §4).
            query_pred=lambda c: c % 50 == 0,
        ),
    }
    # r14: ONE pass over the exact baseline — the old plan ran the
    # block-matmul brute force three times (denominator + one hit
    # join per method). Each method left-joins a match flag onto the
    # exact rows (approx top-k rows are unique per (query, neighbor),
    # so no fan-out), one groupBy yields the denominator and both hit
    # counts, and a literal-array explode unpivots to per-method rows.
    flagged = exact
    for method, df in approx.items():
        flagged = flagged.join(
            df.select(
                "query_id", "neighbor_id",
                F.lit(1).alias(f"__m_{method}"),
            ),
            ["query_id", "neighbor_id"],
            "left",
        )
    per_q = flagged.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        *[
            F.count(f"__m_{m}").alias(f"__hit_{m}")
            for m in approx
        ],
    )
    out = per_q.select(
        "query_id",
        "n_exact",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(m).alias("method"),
                    F.col(f"__hit_{m}").alias("n_hit"),
                )
                for m in approx
            ])
        ).alias("__e"),
    ).select(
        "query_id", "n_exact",
        F.col("__e.method").alias("method"),
        F.col("__e.n_hit").alias("n_hit"),
    )
    return (
        out.withColumn(
            "recall_permille", F.expr("(1000 * n_hit) DIV n_exact")
        )
        .select(
            "method", "query_id", "n_exact", "n_hit",
            "recall_permille",
        )
        .orderBy("method", "query_id")
    )


QUERIES = {
    "x110_k_anonymity": x110_k_anonymity,
    "x111_rater_agreement": x111_rater_agreement,
    "x112_calibration_bins": x112_calibration_bins,
    "x113_clustering_coeff": x113_clustering_coeff,
    "x114_psi_drift": x114_psi_drift,
    "s17_stream_psi": s17_stream_psi,
    "x115_seasonal_index": x115_seasonal_index,
    "x116_ann_recall": x116_ann_recall,
}

ORACLES: dict[str, str] = {}

ORACLES["x110_k_anonymity"] = f"""
WITH sens AS (
    SELECT c_nationkey, c_mktsegment,
           (CAST(round(c_acctbal * 100) AS BIGINT) + 100000)
               // 100000 AS bal_bucket
    FROM customer
),
pairs AS (
    SELECT c_nationkey, c_mktsegment, bal_bucket,
           CAST(count(*) AS BIGINT) AS pair_rows
    FROM sens GROUP BY c_nationkey, c_mktsegment, bal_bucket
),
classes AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(sum(pair_rows) AS BIGINT) AS class_size,
           CAST(count(*) AS BIGINT) AS ldiv
    FROM pairs GROUP BY c_nationkey, c_mktsegment
)
SELECT class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows,
       CAST(min(ldiv) AS BIGINT) AS min_ldiv,
       CAST(class_size < {K_ANON} AS INT) AS violates_k
FROM classes
GROUP BY class_size
ORDER BY class_size
"""

ORACLES["x111_rater_agreement"] = """
WITH rated AS (
    SELECT least(n_chars // 120, 4) AS a,
           least(CAST(len(str_split_regex(trim(text), '\\s+'))
                      AS BIGINT) // 20, 4) AS b
    FROM documents
),
cells AS (
    SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
    FROM rated GROUP BY a, b
),
marg AS (
    SELECT a, b, c_ab,
           CAST(sum(c_ab) OVER (PARTITION BY a) AS BIGINT) AS c_a,
           CAST(sum(c_ab) OVER (PARTITION BY b) AS BIGINT) AS c_b
    FROM cells
),
tot AS (
    SELECT CAST(sum(c_ab) AS BIGINT) AS n,
           CAST(sum(CASE WHEN a = b THEN c_ab ELSE 0 END)
                AS BIGINT) AS diag
    FROM cells
),
rm AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS r FROM cells GROUP BY a),
cm AS (SELECT b, CAST(sum(c_ab) AS BIGINT) AS c FROM cells GROUP BY b),
e AS (
    SELECT CAST(coalesce(sum(rm.r * cm.c), 0) AS BIGINT) AS e
    FROM rm JOIN cm ON rm.a = cm.b
),
scal AS (
    SELECT tot.n, tot.n * tot.diag - e.e AS kappa_num,
           tot.n * tot.n - e.e AS kappa_den
    FROM tot CROSS JOIN e
)
SELECT marg.a, marg.b, marg.c_ab, marg.c_a, marg.c_b,
       scal.n,
       CAST(scal.kappa_num AS BIGINT) AS kappa_num,
       CAST(scal.kappa_den AS BIGINT) AS kappa_den,
       CAST((1000 * scal.kappa_num) // scal.kappa_den
            AS BIGINT) AS kappa_permille
FROM marg CROSS JOIN scal
ORDER BY marg.a, marg.b
"""

ORACLES["x112_calibration_bins"] = """
WITH scored AS (
    SELECT CAST(round(l_discount * 1000) AS BIGINT) AS score,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
    FROM lineitem
),
b AS (
    SELECT score // 10 AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(score) AS BIGINT) AS score_sum
    FROM scored GROUP BY score // 10
)
SELECT bin, n, n_pos,
       CAST(score_sum // n AS BIGINT) AS mean_score_permille,
       CAST((1000 * n_pos) // n AS BIGINT) AS pos_permille,
       CAST((1000 * n_pos) // n - score_sum // n
            AS BIGINT) AS gap_permille
FROM b
ORDER BY bin
"""

ORACLES["x113_clustering_coeff"] = f"""
WITH {_minhash_verified_ctes(16, 4)},
vpairs AS (SELECT id_a, id_b FROM vstats WHERE jaccard >= 0.8),
e AS (SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
      FROM vpairs WHERE id_a <> id_b),
deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        GROUP BY n),
o AS (SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS dst
      FROM e JOIN deg d1 ON d1.n = e.u JOIN deg d2 ON d2.n = e.v),
wed AS (SELECT w1.src, w1.dst AS x, w2.dst AS y
        FROM o w1 JOIN o w2 ON w1.src = w2.src AND w1.dst < w2.dst),
tris AS (SELECT src, x, y
         FROM wed JOIN e ON x = e.u AND y = e.v),
tcnt AS (
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (SELECT src AS node FROM tris
          UNION ALL SELECT x FROM tris
          UNION ALL SELECT y FROM tris)
    GROUP BY node
)
SELECT deg.n AS doc_id,
       deg.d AS degree,
       CAST(coalesce(tcnt.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(2 * coalesce(tcnt.n_triangles, 0) AS BIGINT) AS coeff_num,
       CAST(deg.d * (deg.d - 1) AS BIGINT) AS coeff_den,
       CAST(CASE WHEN deg.d >= 2
                 THEN (1000 * 2 * coalesce(tcnt.n_triangles, 0))
                      // (deg.d * (deg.d - 1))
                 ELSE 0 END AS BIGINT) AS coeff_permille
FROM deg LEFT JOIN tcnt ON tcnt.node = deg.n
ORDER BY doc_id
"""

ORACLES["x114_psi_drift"] = f"""
WITH rc AS (
    SELECT event_type AS cat, CAST(count(*) AS BIGINT) AS c_ref
    FROM events WHERE epoch_ns(ts) < {PSI_SPLIT_NS}
    GROUP BY event_type
),
cc AS (
    SELECT event_type AS cat, CAST(count(*) AS BIGINT) AS c_cmp
    FROM events WHERE epoch_ns(ts) >= {PSI_SPLIT_NS}
    GROUP BY event_type
),
cats AS (
    SELECT coalesce(rc.cat, cc.cat) AS cat,
           CAST(coalesce(rc.c_ref, 0) AS BIGINT) AS c_ref,
           CAST(coalesce(cc.c_cmp, 0) AS BIGINT) AS c_cmp
    FROM rc FULL OUTER JOIN cc ON rc.cat = cc.cat
),
tot AS (
    SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
           CAST(sum(c_cmp) AS BIGINT) AS n_cmp
    FROM cats
)
SELECT cat AS event_type, c_ref, c_cmp, tot.n_ref, tot.n_cmp,
       CASE WHEN c_ref > 0 AND c_cmp > 0 THEN
           (CAST(c_ref AS DOUBLE) / tot.n_ref
            - CAST(c_cmp AS DOUBLE) / tot.n_cmp)
           * ln((CAST(c_ref AS DOUBLE) / tot.n_ref)
                / (CAST(c_cmp AS DOUBLE) / tot.n_cmp))
       END AS psi_term
FROM cats CROSS JOIN tot
ORDER BY event_type
"""

ORACLES["s17_stream_psi"] = f"""
WITH ref AS (
    SELECT event_type AS cat, CAST(count(*) AS BIGINT) AS c_ref
    FROM events WHERE epoch_ns(ts) < {PSI_SPLIT_NS}
    GROUP BY event_type
),
dc AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type AS cat, CAST(count(*) AS BIGINT) AS c_cmp
    FROM events WHERE epoch_ns(ts) >= {PSI_SPLIT_NS}
    GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM dc),
grid AS (SELECT days.day, ref.cat, ref.c_ref
         FROM days CROSS JOIN ref),
j AS (
    SELECT coalesce(grid.day, dc.day) AS day,
           coalesce(grid.cat, dc.cat) AS cat,
           CAST(coalesce(grid.c_ref, 0) AS BIGINT) AS c_ref,
           CAST(coalesce(dc.c_cmp, 0) AS BIGINT) AS c_cmp
    FROM grid FULL OUTER JOIN dc
      ON grid.day = dc.day AND grid.cat = dc.cat
),
nr AS (SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref FROM ref),
tot AS (
    SELECT j.day, j.cat, j.c_ref, j.c_cmp, nr.n_ref,
           CAST(sum(j.c_cmp) OVER (PARTITION BY j.day)
                AS BIGINT) AS n_cmp
    FROM j CROSS JOIN nr
)
SELECT day, cat AS event_type, c_ref, c_cmp, n_ref, n_cmp,
       CASE WHEN c_ref > 0 AND c_cmp > 0 THEN
           (CAST(c_ref AS DOUBLE) / n_ref
            - CAST(c_cmp AS DOUBLE) / n_cmp)
           * ln((CAST(c_ref AS DOUBLE) / n_ref)
                / (CAST(c_cmp AS DOUBLE) / n_cmp))
       END AS psi_term
FROM tot
ORDER BY day, event_type
"""

ORACLES["x115_seasonal_index"] = """
WITH o AS (
    SELECT month(o_orderdate) AS month,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
monthly AS (
    SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS rev_cents
    FROM o GROUP BY month
),
tot AS (
    SELECT CAST(sum(rev_cents) AS BIGINT) AS rev_total_cents
    FROM monthly
)
SELECT monthly.month, monthly.n_orders, monthly.rev_cents,
       tot.rev_total_cents,
       CAST((1000 * 12 * monthly.rev_cents) // tot.rev_total_cents
            AS BIGINT) AS seasonal_permille
FROM monthly CROSS JOIN tot
ORDER BY monthly.month
"""


def _ann_recall_oracle() -> str:
    """Composes the already-certified x9 (exact), x23 (IVF) and x10
    (LSH) oracle texts as nested-WITH subqueries — the recall joins
    are the only new SQL, so the certificate inherits the certified
    branch semantics verbatim."""
    from m5_competition_kaggle_spark.queries import extensions
    from m5_competition_kaggle_spark.queries import llm_curation

    exact_sql = extensions.ORACLES["x9_sim_topk"]
    lsh_sql = extensions.ORACLES["x10_sim_topk_lsh"]
    ivf_sql = llm_curation.ORACLES["x23_sim_topk_ivf"]
    return f"""
WITH exact AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM ({exact_sql}) t
),
ivf AS (SELECT query_id, neighbor_id FROM ({ivf_sql}) t),
lsh AS (SELECT query_id, neighbor_id FROM ({lsh_sql}) t),
ne AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
    FROM exact GROUP BY query_id
),
hits AS (
    SELECT 'ivf' AS method, e.query_id,
           CAST(count(*) AS BIGINT) AS n_hit
    FROM exact e JOIN ivf a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
    UNION ALL
    SELECT 'lsh', e.query_id, CAST(count(*) AS BIGINT)
    FROM exact e JOIN lsh a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.query_id
),
methods AS (SELECT 'ivf' AS method UNION ALL SELECT 'lsh')
SELECT m.method, ne.query_id, ne.n_exact,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST((1000 * coalesce(h.n_hit, 0)) // ne.n_exact
            AS BIGINT) AS recall_permille
FROM ne CROSS JOIN methods m
LEFT JOIN hits h ON h.query_id = ne.query_id AND h.method = m.method
ORDER BY m.method, ne.query_id
"""


ORACLES["x116_ann_recall"] = _ann_recall_oracle()
