"""Round-11 queue — staged BEHIND the staged r10 batch (neither is
registered in ``queries/__init__``; the r10 window is already fully
planned as 9 r10 promotions + 41 re-banks). Locally certified by
``tests/test_r11_queue.py`` with the same Spark-vs-DuckDB
differential as ``scripts/check_oracle.py``.

- x156 trained-codebook recall (``operators/kmeans.py``): recall@10
  of the IVF probe under the 2-round Lloyd-trained centroids vs the
  exact baseline — directly comparable to x116's seed-rule recall
  (same query set, k, nprobe), certifying that TRAINING the codebook
  is an improvement, not a regression.
- x157 vocabulary-growth deciles (``operators/heaps.py``): the
  Heaps-law curve — cumulative types vs tokens at ten doc-ordered
  checkpoints with exact type-token ratios; junk and duplication
  bend this curve in opposite directions.
- x158 pair-distance histogram (``operators/pairdist.py``): exact
  squared-L2 distance mass over the deterministic id-modulus sample
  — the threshold-picking diagnostic under every near-dup /
  semantic-dedup radius.
- x159 exact-Jaccard threshold sweep: the text-side twin of x158 —
  per-bucket pair mass of exact Jaccard over the sampled corpus,
  justifying any MinHash threshold choice.
- x160 cross-source duplication matrix: the certified x2 MinHash
  pairs rolled to an unordered source-pair matrix — where
  duplication FLOWS between sources.
- x161 kNN radius profile: rank-1 vs rank-10 exact dot per query —
  the local-density / hubness diagnostic that picks IVF probe radii.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import load_table


def x156_trained_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall@10 under the trained codebook (x155's centroids, same
    probe shape as x23/x116: nprobe=4, 16 lists) vs the exact top-10,
    per query — one row per query with exact hit counts."""
    from m5_competition_kaggle_spark.operators.kmeans import (
        ivf_topk_trained,
        train_centroids,
    )
    from m5_competition_kaggle_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") % 50 == 0)
    cent = train_centroids(emb, k=16, rounds=2)
    approx = ivf_topk_trained(emb, qset, cent, k=10, nprobe=4)
    exact = brute_force_topk(emb, qset, k=10).select(
        "query_id", "neighbor_id"
    )
    # r14: denominator and hit count come out of ONE pass over the
    # exact baseline (left join against the approx top-k with a match
    # flag) — the old two-consumer shape ran the block-matmul brute
    # force twice. The approx top-k has unique (query, neighbor) rows
    # (rank ≤ k), so the left join cannot fan out.
    return (
        exact.join(
            approx.select(
                "query_id", "neighbor_id", F.lit(1).alias("__m")
            ),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__m").alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            F.col("n_hit").cast("long").alias("n_hit"),
            F.expr(
                "(1000 * n_hit) DIV n_exact"
            ).alias("recall_permille"),
        )
        .orderBy("query_id")
    )


def x157_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps curve of the documents corpus at ten doc-id-ordered
    checkpoints."""
    from m5_competition_kaggle_spark.operators.heaps import (
        vocab_growth_deciles,
    )

    docs = load_table(spark, sf_dir, "documents")
    return vocab_growth_deciles(docs).orderBy("decile")


def x158_pair_distances(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distance-mass histogram of the vec_id % 25 embedding sample,
    fixed 10⁵ bucket width (the fixture's d² mass spans ~1.3–2.6
    ·10⁶, so ~13–26 populated buckets at any SF)."""
    from m5_competition_kaggle_spark.operators.pairdist import (
        pair_distance_histogram,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return pair_distance_histogram(
        emb, modulus=25, bucket_width=100_000
    ).orderBy("bucket")


def x159_jaccard_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard mass over the doc_id % 5 document sample — the
    TEXT-side twin of x158's embedding histogram, and the diagnostic
    that justifies any MinHash threshold choice: per 100-permille
    bucket, how many pairs sit there? Same whitespace tokenization as
    the certified x2 pipeline; the sample-side pair join broadcasts
    (BNLJ, x142 precedent)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    s = docs.select(
        F.col("doc_id").alias("d"),
        F.array_distinct(
            F.split(F.trim(F.col("text")), r"\s+")
        ).alias("toks"),
    ).withColumn("nt", F.size("toks").cast("long"))
    b = s.select(
        F.col("d").alias("d2"),
        F.col("toks").alias("toks2"),
        F.col("nt").alias("nt2"),
    )
    pairs = s.join(
        F.broadcast(b), F.col("d") < F.col("d2"), "inner"
    ).select(
        (
            F.lit(1000)
            * F.size(F.array_intersect("toks", "toks2")).cast("long")
        ).alias("__num"),
        (
            F.col("nt")
            + F.col("nt2")
            - F.size(F.array_intersect("toks", "toks2")).cast("long")
        ).alias("__den"),
        ((F.col("nt") + F.col("nt2")) > 0).alias("__cheap_nonempty"),
    )
    # __den = 0 is possible only for degenerate token sets (two empty
    # token arrays; NULL texts propagate NULL and are dropped by the
    # guard in both engines — Spark's size(NULL) is NULL under
    # default non-legacy conf, not -1); Spark non-ANSI DIV would
    # yield NULL while the DuckDB twin raises division-by-zero, so
    # the guard keeps the differential well-defined on ANY input
    # (ADVICE r9). No-op on the fixture (non-null text ⇒ __den ≥ 1).
    # The guard tests nt + nt2, not __den: inter ≤ min(nt, nt2) gives
    # __den = nt + nt2 − inter ≥ max(nt, nt2), so the two predicates
    # select identical rows — but __den references array_intersect,
    # and Catalyst pushes the filter into the BNLJ condition, which
    # would evaluate the intersect per pair BEFORE the projection
    # (measured: 3 intersect evaluations per pair instead of 1 —
    # codegen subexpression elimination works within the Project but
    # never across the join-condition boundary).
    jac = pairs.where(F.col("__cheap_nonempty")).select(
        F.expr("__num DIV __den").alias("jac_permille")
    )
    return (
        jac.groupBy(
            F.expr("jac_permille DIV 100").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("jac_permille").alias("min_jac"),
            F.max("jac_permille").alias("max_jac"),
        )
        .orderBy("bucket")
    )


def x160_cross_source_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WHERE does duplication flow between sources? The certified
    MinHash near-dup pairs (x2's exact machinery, threshold 0.8)
    labeled by both docs' sources and rolled to an unordered
    source-pair matrix — the contamination-direction view the flat
    pair list (x2) and the per-source overlap sketch (x69) don't
    give."""
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.8,
    ).select("id_a", "id_b")
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"),
                F.col("source").alias("src_a"),
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"),
                F.col("source").alias("src_b"),
            ),
            "id_b",
        )
    )
    return (
        labeled.groupBy(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_lo", "source_hi")
    )


def x161_knn_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query kNN radius profile from the exact top-10 (x9's
    machinery): the rank-1 and rank-10 dot scores and their permille
    contrast — the local-density diagnostic that picks IVF probe
    radii and flags hubness (a query whose 10th neighbor is nearly
    as close as its 1st sits in a dense, hard-to-index region)."""
    from m5_competition_kaggle_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") % 50 == 0)
    topk = brute_force_topk(emb, qset, k=10)
    edges = topk.filter(F.col("rank").isin(1, 10)).groupBy(
        "query_id"
    ).agg(
        F.max(
            F.when(F.col("rank") == 1, F.col("dot"))
        ).alias("dot_top1"),
        F.max(
            F.when(F.col("rank") == 10, F.col("dot"))
        ).alias("dot_top10"),
    )
    return edges.select(
        "query_id",
        "dot_top1",
        "dot_top10",
        F.when(
            F.col("dot_top1") != 0,
            F.expr("1000 * dot_top10 DIV dot_top1"),
        ).alias("contrast_permille"),
    ).orderBy("query_id")


QUERIES = {
    "x156_trained_recall": x156_trained_recall,
    "x157_vocab_growth": x157_vocab_growth,
    "x158_pair_distances": x158_pair_distances,
    "x159_jaccard_sweep": x159_jaccard_sweep,
    "x160_cross_source_dups": x160_cross_source_dups,
    "x161_knn_radius": x161_knn_radius,
}

ORACLES: dict[str, str] = {}

ORACLES["x157_vocab_growth"] = """
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
)
SELECT decile, r AS docs, tokens_cum, types_cum,
       CASE WHEN tokens_cum > 0
            THEN 1000000 * types_cum // tokens_cum END AS ttr_ppm
FROM cp WHERE rn = 1
ORDER BY decile
"""

ORACLES["x158_pair_distances"] = """
WITH s AS (
    SELECT vec_id AS vid,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
               AS v
    FROM embeddings WHERE vec_id % 25 = 0
),
pairs AS (
    SELECT a.vid, b.vid AS wid,
           CAST(sum((a.v[u.i] - b.v[u.i]) * (a.v[u.i] - b.v[u.i]))
                AS BIGINT) AS d2
    FROM s a JOIN s b ON a.vid < b.vid,
         unnest(generate_series(1, len(a.v))) AS u(i)
    GROUP BY a.vid, b.vid
)
SELECT d2 // 100000 AS bucket,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(d2) AS BIGINT) AS min_d2,
       CAST(max(d2) AS BIGINT) AS max_d2
FROM pairs GROUP BY 1 ORDER BY 1
"""


ORACLES["x159_jaccard_sweep"] = """
WITH samp AS (
    SELECT doc_id AS d,
           list_distinct(str_split_regex(trim(text), '\\s+'))
               AS toks
    FROM documents WHERE doc_id % 5 = 0
),
samp2 AS (
    SELECT d, toks, CAST(len(toks) AS BIGINT) AS nt FROM samp
),
pr AS (
    SELECT CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT)
               AS inter,
           a.nt + b.nt AS tot
    FROM samp2 a JOIN samp2 b ON a.d < b.d
),
jac AS (
    SELECT 1000 * inter // (tot - inter) AS jp FROM pr
    WHERE tot - inter > 0
)
SELECT jp // 100 AS bucket,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(jp) AS BIGINT) AS min_jac,
       CAST(max(jp) AS BIGINT) AS max_jac
FROM jac GROUP BY 1 ORDER BY 1
"""


ORACLES["x161_knn_radius"] = """
WITH qq AS MATERIALIZED (
    SELECT vec_id AS query_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
               AS qv
    FROM embeddings WHERE vec_id % 50 = 0
),
vv AS MATERIALIZED (
    SELECT vec_id AS nid,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
               AS v
    FROM embeddings
),
edot AS MATERIALIZED (
    SELECT s.query_id, v.nid,
           CAST(sum(s.qv[u.i] * v.v[u.i]) AS BIGINT) AS dot
    FROM qq s CROSS JOIN vv v,
         unnest(generate_series(1, len(s.qv))) AS u(i)
    WHERE v.nid <> s.query_id
    GROUP BY 1, 2
),
rk AS (
    SELECT query_id, dot,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot DESC, nid ASC) AS r
    FROM edot
)
SELECT query_id,
       CAST(max(CASE WHEN r = 1 THEN dot END) AS BIGINT)
           AS dot_top1,
       CAST(max(CASE WHEN r = 10 THEN dot END) AS BIGINT)
           AS dot_top10,
       CASE WHEN max(CASE WHEN r = 1 THEN dot END) <> 0 THEN
           1000 * CAST(max(CASE WHEN r = 10 THEN dot END) AS BIGINT)
               // CAST(max(CASE WHEN r = 1 THEN dot END) AS BIGINT)
       END AS contrast_permille
FROM rk WHERE r IN (1, 10)
GROUP BY query_id ORDER BY query_id
"""


def _cross_source_oracle() -> str:
    """Wraps the certified x2 MinHash-pair oracle (its CTE names are
    docs/sh0/sh/sig/bands/pairs/sizes/common/vstats — the outer names
    here deliberately avoid all of them, the x156 clash lesson) with
    the unordered source-pair rollup."""
    from m5_competition_kaggle_spark.queries import extensions

    x2 = extensions.ORACLES["x2_dedup_minhash"]
    return f"""
WITH xsd_pairs AS MATERIALIZED (
    SELECT id_a, id_b FROM ({x2}) t
),
xsd_src AS (SELECT doc_id, source FROM documents)
SELECT least(sa.source, sb.source) AS source_lo,
       greatest(sa.source, sb.source) AS source_hi,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM xsd_pairs p
JOIN xsd_src sa ON sa.doc_id = p.id_a
JOIN xsd_src sb ON sb.doc_id = p.id_b
GROUP BY 1, 2
ORDER BY 1, 2
"""


ORACLES["x160_cross_source_dups"] = _cross_source_oracle()


def _trained_recall_oracle() -> str:
    """Composes the x155 trained-centroid construction (rounds
    unrolled, the _kmeans_oracle arithmetic) with the trained-probe
    assignment and the exact brute-force baseline (x9's arithmetic,
    restated on this oracle's own quantized CTE — x9's text defines
    a clashing `q` alias, so it cannot nest verbatim)."""
    from m5_competition_kaggle_spark.queries.extensions_r10 import (
        _kmeans_oracle,
    )

    km = _kmeans_oracle(16, 2)
    # reuse the trained-centroid CTE chain: everything up to cent2,
    # then probe instead of summarize
    head, _, _tail = km.partition(",\ndfin AS MATERIALIZED (")
    return (
        head
        + f""",
qset AS MATERIALIZED (
    SELECT vid AS query_id, v AS qv FROM q WHERE vid % 50 = 0
),
vdist AS MATERIALIZED (
    SELECT q.vid, c.cid,
           CAST(sum((q.v[u.i] - c.cv[u.i])
                    * (q.v[u.i] - c.cv[u.i])) AS BIGINT) AS d2
    FROM q CROSS JOIN cent2 c,
         unnest(generate_series(1, len(q.v))) AS u(i)
    GROUP BY 1, 2
),
vassign AS MATERIALIZED (
    SELECT vid, cid FROM (
        SELECT vid, cid,
               row_number() OVER (PARTITION BY vid
                                  ORDER BY d2 ASC, cid ASC) AS rn
        FROM vdist
    ) WHERE rn = 1
),
qdist AS (
    SELECT s.query_id, c.cid,
           CAST(sum((s.qv[u.i] - c.cv[u.i])
                    * (s.qv[u.i] - c.cv[u.i])) AS BIGINT) AS d2
    FROM qset s CROSS JOIN cent2 c,
         unnest(generate_series(1, len(s.qv))) AS u(i)
    GROUP BY 1, 2
),
qprobe AS MATERIALIZED (
    SELECT query_id, cid FROM (
        SELECT query_id, cid,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d2 ASC, cid ASC) AS rn
        FROM qdist
    ) WHERE rn <= 4
),
cand AS MATERIALIZED (
    SELECT p.query_id, a.vid AS neighbor_id,
           CAST(sum(q2.v[u.i] * s.qv[u.i]) AS BIGINT) AS dot
    FROM qprobe p
    JOIN vassign a ON a.cid = p.cid
    JOIN qset s ON s.query_id = p.query_id
    JOIN q q2 ON q2.vid = a.vid,
         unnest(generate_series(1, len(s.qv))) AS u(i)
    WHERE a.vid <> p.query_id
    GROUP BY 1, 2
),
approx AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY dot DESC, neighbor_id ASC) AS rn
        FROM cand
    ) WHERE rn <= 10
),
edot AS MATERIALIZED (
    SELECT s.query_id, v.vid AS neighbor_id,
           CAST(sum(s.qv[u.i] * v.v[u.i]) AS BIGINT) AS dot
    FROM qset s CROSS JOIN q v,
         unnest(generate_series(1, len(s.qv))) AS u(i)
    WHERE v.vid <> s.query_id
    GROUP BY 1, 2
),
exact AS MATERIALIZED (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot DESC,
                                           neighbor_id ASC) AS rn
        FROM edot
    ) WHERE rn <= 10
),
n_exact AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
    FROM exact GROUP BY query_id
),
hits AS (
    SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hit
    FROM exact e
    JOIN approx a ON a.query_id = e.query_id
                 AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
)
SELECT n.query_id AS query_id, n.n_exact AS n_exact,
       coalesce(h.n_hit, 0) AS n_hit,
       (1000 * coalesce(h.n_hit, 0)) // n.n_exact AS recall_permille
FROM n_exact n
LEFT JOIN hits h ON h.query_id = n.query_id
ORDER BY n.query_id
"""
    )


ORACLES["x156_trained_recall"] = _trained_recall_oracle()
