"""Round-18 queue — STAGED UNREGISTERED, six rounds ahead (r13–r17
queues are staged; see queries/__init__.py). Locally certified by
``tests/test_r18_queue.py`` with the same Spark-vs-DuckDB differential
as ``scripts/check_oracle.py``.

- x188 dedup-weighted corpus stats: what a dedup pass actually SAVES —
  per source the raw vs post-dedup (canonical-survivor) doc and token
  counts with keep-ppm, composing the certified LSH pairs → CC →
  canonical machinery (x2/x24/x77). The capacity-planning readout a
  training-data pipeline runs before committing a dedup config.
- x189 source KS matrix: pairwise exact Kolmogorov–Smirnov distance
  of the document-length distribution between the five largest
  sources — the ksdist cell kernel in MATRIX form (pair-keyed, so
  every window stays partitioned). Which sources are
  length-profile-compatible for mixing, where x114/x117 compare one
  reference against one current.
- x190 diurnal profile: hour-of-day load concentration per event
  type over the FULL 24-hour grid (empty hours count — an 8-hour
  business-day stream should read concentrated) — peak hour + the
  grouped-cells Gini (`operators/gini.py`) over the 24 hour bins.
- s29 stateful conversions (``streaming/conversion_state.py``): the
  per-user first-view/first-purchase minima as a GroupState stream —
  the second stateful kernel (after s28), with a stronger property:
  min is commutative, so the state converges under ARBITRARY batch
  shuffling (no ordering contract), proven in the queue tests. The
  registered batch twin runs the same kernel per user, certified
  against pure SQL.
- x201 degree assortativity (added r13 second session): Newman's r
  over the x41/x24 near-dup pair graph in exact integer ppm — the
  directed-doubling symmetry kills the sqrt, so the Pearson
  correlation of edge-endpoint degrees certifies bit-exact
  (disjoint-clique corpora pin r = +1 closed-form; regular graphs
  pin the NULL denominator branch).
- x207 dedup quality shift (added r13 second session): the
  survivorship-bias audit — x202's FORCAST grade of the full corpus
  vs the canonical survivors under the certified LSH config, per
  source, from ONE corpus scan; population columns cross-pinned to
  x188 exactly, and a planted boilerplate-family corpus pins the
  +3750 shift closed-form.
- x214 KM return-time hazard (added r14): Kaplan–Meier curve of a
  user's return after d days away on x124's certified km_curve
  kernel (different duration variable: inter-visit spells, the open
  final spell right-censored at corpus end), with the discrete
  hazard 10⁶·d DIV n_risk added beside the product-limit surv_ppm —
  the unbiased retention curve a raw gap histogram (which silently
  drops open spells) can't give. Calendar-bounded rows.
- x220 EMD drift (added r14): per-day 1-D Wasserstein distance to
  the corpus value distribution in exact cross-multiplied integers
  over the corpus value grid — the gap INTEGRAL beside KS's worst
  point (x189/s18) and CvM's squared sum (x175/s26), the only one
  that scales with how FAR mass moved; emd_milli bounded by
  1000·range, day × range bounded cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from m5_competition_kaggle_spark.sources.catalog import load_table

NANOS_PER_HOUR = 3_600_000_000_000
TOP_SOURCES = 5

# --------------------------------------------------------------- x188


def x188_dedup_weighted_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source raw vs canonical-survivor corpus mass under the
    certified LSH near-dup config (16/4, 3-shingles, 0.8): dropped
    docs are the non-canonical members of x24's components (min-id
    survivor, x77's rule). Token counts use the x30 rule. keep_ppm
    floors, so 10⁶ means nothing dropped."""
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from m5_competition_kaggle_spark.operators.graph import (
        dedup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(
            "CAST(size(filter(split(lower(text), '[^a-z0-9]+'),"
            " x -> x <> '')) AS BIGINT)"
        ).alias("n_tok"),
    )
    raw_docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        raw_docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.8,
    ).select("id_a", "id_b")
    dropped = (
        dedup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    marked = docs.join(
        dropped.withColumn("__drop", F.lit(1)), "doc_id", "left"
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(
                F.when(F.col("__drop").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_docs_kept"),
            F.sum(
                F.when(F.col("__drop").isNull(), F.col("n_tok"))
                .otherwise(0)
            ).alias("n_tokens_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_docs_kept",
            "n_tokens_kept",
            F.expr(
                "(1000000 * n_docs_kept) DIV n_docs"
            ).alias("doc_keep_ppm"),
            F.expr(
                "CASE WHEN n_tokens > 0 THEN"
                " (1000000 * n_tokens_kept) DIV n_tokens END"
            ).alias("token_keep_ppm"),
        )
        .orderBy("source")
    )


def _dedup_weighted_oracle() -> str:
    from m5_competition_kaggle_spark.queries.extensions import (
        _minhash_verified_ctes,
    )

    return f"""
WITH RECURSIVE {_minhash_verified_ctes(16, 4)},
vpairs AS (SELECT id_a, id_b FROM vstats WHERE jaccard >= 0.8),
edges AS (SELECT id_a AS a, id_b AS b FROM vpairs
          UNION SELECT id_b, id_a FROM vpairs),
reach(node, reached) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.reached
),
comp AS (SELECT node, min(reached) AS cluster_id
         FROM reach GROUP BY node),
dropped AS (SELECT node AS doc_id FROM comp
            WHERE node <> cluster_id),
dt AS (
    SELECT d.doc_id, d.source,
           CAST(len(list_filter(regexp_split_to_array(
                lower(d.text), '[^a-z0-9]+'), x -> x <> ''))
                AS BIGINT) AS n_tok,
           CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END AS kept
    FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
),
agg AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(kept) AS BIGINT) AS n_docs_kept,
           CAST(sum(CASE WHEN kept = 1 THEN n_tok ELSE 0 END)
                AS BIGINT) AS n_tokens_kept
    FROM dt GROUP BY source
)
SELECT source, n_docs, n_tokens, n_docs_kept, n_tokens_kept,
       (1000000 * n_docs_kept) // n_docs AS doc_keep_ppm,
       CASE WHEN n_tokens > 0 THEN
           (1000000 * n_tokens_kept) // n_tokens
       END AS token_keep_ppm
FROM agg ORDER BY source
"""


# --------------------------------------------------------------- x189


def x189_source_ks_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise exact KS distance of the n_chars distribution between
    the 5 largest sources (by doc count; ties break on the name).
    The ksdist cell kernel with a PAIR partition key: per-source
    length cells build once (one keyed aggregate), the bounded
    10-row pair grid broadcasts onto them, and every running-CDF
    window partitions by (src_a, src_b) — the matrix form of the
    x117 one-vs-one drift test."""
    from m5_competition_kaggle_spark.operators.ksdist import (
        ks_from_cells,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("q")
    )
    top = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "source")
        .limit(TOP_SOURCES)
        .select("source")
    )
    cells = (
        docs.join(F.broadcast(top), "source")
        .groupBy("source", "q")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    a = top.select(F.col("source").alias("src_a"))
    b = top.select(F.col("source").alias("src_b"))
    grid = a.crossJoin(b).filter(F.col("src_a") < F.col("src_b"))
    side_a = grid.join(
        cells.select(
            F.col("source").alias("src_a"),
            "q",
            F.col("c").alias("c_ref"),
        ),
        "src_a",
    ).select(
        "src_a", "src_b", "q", "c_ref", F.lit(0).alias("c_cmp")
    )
    side_b = grid.join(
        cells.select(
            F.col("source").alias("src_b"),
            "q",
            F.col("c").alias("c_cmp"),
        ),
        "src_b",
    ).select(
        "src_a", "src_b", "q", F.lit(0).alias("c_ref"), "c_cmp"
    )
    paired = (
        side_a.unionAll(side_b)
        .groupBy("src_a", "src_b", "q")
        .agg(
            F.sum("c_ref").alias("c_ref"),
            F.sum("c_cmp").alias("c_cmp"),
        )
    )
    return ks_from_cells(paired, ["src_a", "src_b"]).orderBy(
        "src_a", "src_b"
    )


ORACLE_X189 = f"""
WITH ranked AS (
    SELECT source,
           row_number() OVER (
               ORDER BY count(*) DESC, source ASC) AS rn
    FROM documents GROUP BY source
),
top AS (SELECT source FROM ranked WHERE rn <= {TOP_SOURCES}),
cells AS (
    SELECT d.source, d.n_chars AS q,
           CAST(count(*) AS BIGINT) AS c
    FROM documents d JOIN top t ON t.source = d.source
    GROUP BY d.source, d.n_chars
),
grid AS (
    SELECT a.source AS src_a, b.source AS src_b
    FROM top a JOIN top b ON a.source < b.source
),
sides AS (
    SELECT g.src_a, g.src_b, c.q, c.c AS c_ref,
           CAST(0 AS BIGINT) AS c_cmp
    FROM grid g JOIN cells c ON c.source = g.src_a
    UNION ALL
    SELECT g.src_a, g.src_b, c.q, CAST(0 AS BIGINT), c.c
    FROM grid g JOIN cells c ON c.source = g.src_b
),
pcells AS (
    SELECT src_a, src_b, q,
           CAST(sum(c_ref) AS BIGINT) AS c_ref,
           CAST(sum(c_cmp) AS BIGINT) AS c_cmp
    FROM sides GROUP BY src_a, src_b, q
),
scored AS (
    SELECT src_a, src_b, q,
           CAST(sum(c_ref) OVER (PARTITION BY src_a, src_b
                ORDER BY q ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_ref,
           CAST(sum(c_cmp) OVER (PARTITION BY src_a, src_b
                ORDER BY q ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_cmp,
           CAST(sum(c_ref) OVER (PARTITION BY src_a, src_b)
                AS BIGINT) AS n_ref,
           CAST(sum(c_cmp) OVER (PARTITION BY src_a, src_b)
                AS BIGINT) AS n_cmp
    FROM pcells
),
dd AS (
    SELECT src_a, src_b, q, n_ref, n_cmp,
           abs(n_cmp * cum_ref - n_ref * cum_cmp) AS d_num
    FROM scored WHERE n_ref > 0 AND n_cmp > 0
),
picked AS (
    SELECT src_a, src_b, q, n_ref, n_cmp, d_num,
           row_number() OVER (PARTITION BY src_a, src_b
               ORDER BY d_num DESC, q ASC) AS rn
    FROM dd
)
SELECT src_a, src_b, n_ref, n_cmp, q AS q_at, d_num,
       n_ref * n_cmp AS d_den,
       (1000 * d_num) // (n_ref * n_cmp) AS ks_permille
FROM picked WHERE rn = 1
ORDER BY src_a, src_b
"""

# --------------------------------------------------------------- x190


def x190_diurnal_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hour-of-day (UTC) load concentration per event type over the
    FULL 24-hour grid — hours with zero events hold ranks (a stream
    alive 8 hours a day should READ concentrated): the peak hour
    (ties to the earliest) beside the grouped-cells Gini over the 24
    hourly counts. total == type volume; top_share_ppm is the peak
    hour's floor share."""
    from m5_competition_kaggle_spark.operators.gini import (
        gini_by_group,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            f"(ts_nanos DIV {NANOS_PER_HOUR}) % 24"
        ).alias("hour"),
    )
    counts = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(24).select(
                    F.col("id").cast("long").alias("hour")
                )
            )
        )
    )
    full = grid.join(counts, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
    )
    w_peak = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("hour").asc()
    )
    peak = (
        full.withColumn("rn", F.row_number().over(w_peak))
        .filter(F.col("rn") == 1)
        .select(
            "event_type", F.col("hour").alias("peak_hour")
        )
    )
    g = gini_by_group(full, ["event_type"], "cnt")
    return (
        g.join(peak, "event_type")
        .select(
            "event_type",
            F.col("n_members").alias("n_hours"),
            "total",
            "peak_hour",
            F.col("max_value").alias("peak_count"),
            "top_share_ppm",
            "gini_ppm",
        )
        .orderBy("event_type")
    )


ORACLE_X190 = f"""
WITH hours AS (SELECT unnest(generate_series(0, 23)) AS hour),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
    SELECT event_type,
           (epoch_ns(ts) // {NANOS_PER_HOUR}) % 24 AS hour,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
),
full_grid AS (
    SELECT t.event_type, CAST(h.hour AS BIGINT) AS hour,
           coalesce(c.cnt, 0) AS cnt
    FROM types t CROSS JOIN hours h
    LEFT JOIN counts c
      ON c.event_type = t.event_type AND c.hour = h.hour
),
peak AS (
    SELECT event_type, hour AS peak_hour
    FROM (SELECT event_type, hour,
                 row_number() OVER (PARTITION BY event_type
                     ORDER BY cnt DESC, hour ASC) AS rn
          FROM full_grid)
    WHERE rn = 1
),
cells AS (
    SELECT event_type, cnt AS q, CAST(count(*) AS BIGINT) AS c
    FROM full_grid GROUP BY event_type, cnt
),
scored AS (
    SELECT event_type, q, c,
           CAST(sum(c) OVER (PARTITION BY event_type ORDER BY q
                ROWS UNBOUNDED PRECEDING) AS BIGINT) - c AS a_prev
    FROM cells
),
agg AS (
    SELECT event_type,
           CAST(sum(c) AS BIGINT) AS n_hours,
           CAST(sum(q * c) AS BIGINT) AS total,
           CAST(max(q) AS BIGINT) AS peak_count,
           CAST(sum(q * (c * a_prev + (c * (c + 1)) // 2))
                AS BIGINT) AS rank_mass
    FROM scored GROUP BY event_type
)
SELECT a.event_type, a.n_hours, a.total, p.peak_hour,
       a.peak_count,
       CASE WHEN a.total > 0 THEN
           (1000000 * a.peak_count) // a.total
       END AS top_share_ppm,
       CASE WHEN a.total > 0 THEN
           (1000000 * (2 * a.rank_mass
             - (a.n_hours + 1) * a.total))
           // (a.n_hours * a.total) END AS gini_ppm
FROM agg a JOIN peak p ON p.event_type = a.event_type
ORDER BY a.event_type
"""

# ---------------------------------------------------------------- s29


def s29_user_conversions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user conversion rows (first view, first purchase, minute
    lag — the x183 rule) via the batch grouped-map of
    ``streaming/conversion_state.py`` — certifying the Arrow crossing
    against pure SQL, which certifies the applyInPandasWithState
    streaming twin sharing the kernel. Min is commutative, so the
    stream converges under arbitrary batch order (proven in the
    queue tests); x183's one-row summary is this table's aggregate."""
    from m5_competition_kaggle_spark.streaming.conversion_state import (
        batch_user_conversions,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "user_id",
        F.col("ts_nanos").alias("tsn"),
        "event_type",
    )
    return batch_user_conversions(ev).orderBy("user_id")


ORACLE_S29 = """
WITH firsts AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view'
                    THEN epoch_ns(ts) END) AS v0,
           min(CASE WHEN event_type = 'purchase'
                    THEN epoch_ns(ts) END) AS p0
    FROM events
    WHERE event_type IN ('view', 'purchase')
    GROUP BY user_id
)
SELECT user_id, v0, p0,
       CASE WHEN v0 IS NOT NULL AND p0 IS NOT NULL
             AND p0 >= v0 THEN
           (p0 - v0) // 60000000000 END AS lag_min
FROM firsts WHERE v0 IS NOT NULL
ORDER BY user_id
"""


# --------------------------------------------------------------- x201


def x201_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the MinHash near-dup pair graph (the
    x41/x24 graph): do high-degree documents link to other high-degree
    documents (template hubs clustering, r > 0) or to low-degree ones
    (star/hub-spoke dedup families, r < 0)? The one-number structure
    readout that says whether near-dup mass sits in dense cliques
    (cluster-collapse dedup is cheap) or sprawling stars (canonical
    choice matters more).

    Newman's r over the DIRECTED doubling of the undirected edge set;
    by src/dst symmetry Sj == Sk and Σj² == Σk², so
    ``r = (m·Σjk − Sj²) / (m·Σj² − Sj²)`` — fully rational, no sqrt,
    certifiable in exact integer arithmetic (ppm). Denominator ≥ 0 by
    Cauchy–Schwarz; 0 exactly for regular graphs → NULL. |r| ≤ 1
    mathematically, so the 10⁶-scaled DIV quotient is bounded at
    ±10⁶ — no decimal-DIV wrap exposure. Transients in DECIMAL(38,0);
    the BIGINT output casts raise loudly under ANSI beyond the
    documented envelope (Σjk < 2⁶³: degrees ≤10⁶ with 10¹⁰ directed
    edges ⇒ ~10²² needs the decimal transient, which holds to 10³⁸).

    Scale shape: the pair graph comes from the certified LSH
    composition (never all-pairs); degree is one hash-aggregate over
    edges; the two degree attachments are keyed joins against the
    |nodes|-sized degree table; the final reduce is a global 1-row
    aggregate. Work linear in |edges| — on clone-replicated corpora
    edges themselves grow quadratically in clone count (the disclosed
    x2-family contract), and this adds only a constant number of
    linear passes on top.

    Reference parity: no graph surface in the reference; engine
    extension (SURVEY §2 graph family beside x24/x41/x58/x65).

    .. note:: calls ``minhash_lsh_pairs``, which launches a Spark job
       at call time (eager localCheckpoint) — not a lazy plan.
    """
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.8,
    ).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst")
        )
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ej = (
        edges.join(deg, "src")
        .withColumnRenamed("deg", "j")
        .join(deg.withColumnRenamed("src", "dst"), "dst")
        .withColumnRenamed("deg", "k")
    )
    from m5_competition_kaggle_spark.queries.extensions_r20 import (
        _SIGNED_DIV,
    )

    dec = "decimal(38,0)"
    agg = ej.agg(
        F.count(F.lit(1)).alias("m_directed"),
        F.countDistinct("src").alias("n_nodes"),
        F.sum(F.col("j").cast(dec)).alias("__sj"),
        F.sum((F.col("j") * F.col("k")).cast(dec)).alias("__sjk"),
        F.sum((F.col("j") * F.col("j")).cast(dec)).alias("__sj2"),
    ).select(
        "*",
        (
            F.col("m_directed").cast(dec) * F.col("__sjk")
            - F.col("__sj") * F.col("__sj")
        ).alias("__num"),
        (
            F.col("m_directed").cast(dec) * F.col("__sj2")
            - F.col("__sj") * F.col("__sj")
        ).alias("__den"),
    )
    # |r| <= 1 mathematically, so the macro's int64-envelope raise
    # branch is unreachable here; it stays for uniformity with the
    # x169/x176/x195-x197 sites (truncation toward zero, loud on any
    # engine that would otherwise NULL or wrap).
    ppm = _SIGNED_DIV.format(
        num="__num", den="__den", scale=1_000_000,
        ctx="x201_degree_assortativity",
    )
    return agg.selectExpr(
        "n_nodes",
        "m_directed",
        "CAST(__sj AS BIGINT) AS sum_src_deg",
        "CAST(__sjk AS BIGINT) AS sum_deg_prod",
        "CAST(__sj2 AS BIGINT) AS sum_src_deg_sq",
        f"CASE WHEN __den <> 0 THEN {ppm} END AS assort_ppm",
    )


ORACLE_X201 = """
WITH RECURSIVE {ctes},
p AS (SELECT id_a, id_b FROM vstats WHERE jaccard >= 0.8),
edges AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION ALL
          SELECT id_b, id_a FROM p),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
ej AS (SELECT dj.deg AS j, dk.deg AS k
       FROM edges e
       JOIN deg dj ON dj.src = e.src
       JOIN deg dk ON dk.src = e.dst),
agg AS (SELECT count(*) AS m_directed,
               CAST(sum(j) AS HUGEINT) AS sj,
               CAST(sum(j * k) AS HUGEINT) AS sjk,
               CAST(sum(j * j) AS HUGEINT) AS sj2
        FROM ej),
nn AS (SELECT count(*) AS n_nodes FROM deg),
frac AS (SELECT m_directed * sjk - sj * sj AS num,
                m_directed * sj2 - sj * sj AS den
         FROM agg)
SELECT nn.n_nodes,
       agg.m_directed,
       CAST(agg.sj AS BIGINT) AS sum_src_deg,
       CAST(agg.sjk AS BIGINT) AS sum_deg_prod,
       CAST(agg.sj2 AS BIGINT) AS sum_src_deg_sq,
       CASE WHEN f.den <> 0 THEN
           CASE WHEN f.num >= 0
                THEN CAST((1000000 * f.num) // f.den AS BIGINT)
                ELSE -CAST((1000000 * -f.num) // f.den AS BIGINT)
           END
       END AS assort_ppm
FROM agg CROSS JOIN nn CROSS JOIN frac f
"""


def _x201_oracle() -> str:
    from m5_competition_kaggle_spark.queries.extensions import (
        _minhash_verified_ctes,
    )

    return ORACLE_X201.format(ctes=_minhash_verified_ctes(16, 4))


# --------------------------------------------------------------- x207


def x207_dedup_quality_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """What dedup does to TEXT QUALITY, per source: the FORCAST
    milli-grade (x202's from-scratch readability) of the full corpus
    versus the canonical-survivor corpus under the certified LSH
    config — the survivorship-bias audit beside x188's mass
    accounting. A dedup pass that systematically drops the easy
    boilerplate RAISES the surviving grade; one that eats long-tail
    natural text LOWERS it; shift_milli reads the direction and size
    exactly.

    Pure composition of two certified reductions: the x188 dropped
    set (LSH pairs → connected components → non-canonical members)
    left-joins onto the x202 per-doc grade projection; one keyed
    aggregate emits both populations' sums side by side, so the two
    means come from ONE corpus scan. All-integer (grade sums are
    BIGINT; truncating DIV on nonnegative operands; the mean shift is
    a plain BIGINT difference, negative when dedup removes the
    hard-text tail).

    Reference parity: engine extension (SURVEY §2 dedup + text
    families; the composition pattern of x94/x98).

    .. note:: calls ``minhash_lsh_pairs`` (eager localCheckpoint) —
       not a lazy plan.
    """
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from m5_competition_kaggle_spark.operators.graph import (
        dedup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    graded = docs.select(
        "doc_id",
        "source",
        F.expr(
            "transform(filter(split(lower(text), '[^a-z0-9]+'),"
            " x -> x <> ''), x -> greatest(1L,"
            " CAST(size(regexp_extract_all(x, '[aeiou]+', 0))"
            " AS BIGINT)))"
        ).alias("__sylls"),
    ).select(
        "doc_id",
        "source",
        F.expr("CAST(size(__sylls) AS BIGINT)").alias("n_words"),
        F.expr(
            "CAST(size(filter(__sylls, s -> s = 1)) AS BIGINT)"
        ).alias("n_mono"),
    )
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.8,
    ).select("id_a", "id_b")
    dropped = (
        dedup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    marked = graded.join(
        dropped.withColumn("__drop", F.lit(1)), "doc_id", "left"
    ).select(
        "source",
        "n_words",
        F.when(
            F.col("n_words") > 0,
            F.lit(20000) - F.expr("(15000 * n_mono) DIV n_words"),
        ).alias("grade"),
        (F.col("__drop").isNull()).cast("long").alias("kept"),
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.sum(
                F.when(F.col("grade").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_scored"),
            F.sum(
                F.when(
                    F.col("grade").isNotNull() & (F.col("kept") == 1),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_scored_kept"),
            F.sum("grade").alias("__gs_all"),
            F.sum(F.when(F.col("kept") == 1, F.col("grade")))
            .alias("__gs_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            "n_scored",
            "n_scored_kept",
            F.expr(
                "CASE WHEN n_scored > 0 THEN"
                " __gs_all DIV n_scored END"
            ).alias("mean_grade_all"),
            F.expr(
                "CASE WHEN n_scored_kept > 0 THEN"
                " __gs_kept DIV n_scored_kept END"
            ).alias("mean_grade_kept"),
            F.expr(
                "CASE WHEN n_scored > 0 AND n_scored_kept > 0 THEN"
                " (__gs_kept DIV n_scored_kept)"
                " - (__gs_all DIV n_scored) END"
            ).alias("shift_milli"),
        )
        .orderBy("source")
    )


def _x207_oracle() -> str:
    from m5_competition_kaggle_spark.queries.extensions import (
        _minhash_verified_ctes,
    )

    return f"""
WITH RECURSIVE {_minhash_verified_ctes(16, 4)},
vpairs AS (SELECT id_a, id_b FROM vstats WHERE jaccard >= 0.8),
edges AS (SELECT id_a AS a, id_b AS b FROM vpairs
          UNION SELECT id_b, id_a FROM vpairs),
reach(node, reached) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.reached
),
comp AS (SELECT node, min(reached) AS cluster_id
         FROM reach GROUP BY node),
dropped AS (SELECT node AS doc_id FROM comp
            WHERE node <> cluster_id),
graded AS (
    SELECT d.doc_id, d.source,
           list_transform(
               list_filter(regexp_split_to_array(lower(d.text),
                                                 '[^a-z0-9]+'),
                           x -> x <> ''),
               x -> greatest(1, len(regexp_extract_all(x,
                                                       '[aeiou]+')))
           ) AS sylls,
           CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END AS kept
    FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
),
per_doc AS (
    SELECT source, kept,
           CASE WHEN len(sylls) > 0 THEN
               20000 - (15000 * CAST(len(list_filter(sylls,
                        s -> s = 1)) AS BIGINT))
                       // CAST(len(sylls) AS BIGINT)
           END AS grade
    FROM graded
),
agg AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN grade IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_scored,
           CAST(sum(CASE WHEN grade IS NOT NULL AND kept = 1
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_scored_kept,
           CAST(sum(grade) AS BIGINT) AS gs_all,
           CAST(sum(CASE WHEN kept = 1 THEN grade END) AS BIGINT)
               AS gs_kept
    FROM per_doc GROUP BY source
)
SELECT source, n_docs, n_kept, n_scored, n_scored_kept,
       CASE WHEN n_scored > 0 THEN gs_all // n_scored END
           AS mean_grade_all,
       CASE WHEN n_scored_kept > 0 THEN gs_kept // n_scored_kept END
           AS mean_grade_kept,
       CASE WHEN n_scored > 0 AND n_scored_kept > 0 THEN
           (gs_kept // n_scored_kept) - (gs_all // n_scored) END
           AS shift_milli
FROM agg ORDER BY source
"""


# --------------------------------------------------------------- x214

NANOS_PER_DAY = 86_400_000_000_000


def x214_km_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier RETURN-TIME curve with right-censoring, on the
    certified ``operators/survival.py::km_curve`` kernel (x124's
    operator, different duration variable): each user-active-day's
    duration to that user's NEXT active day is an observed return
    ("death" in KM terms); each user's final active day contributes
    a CENSORED spell t_max − last_day (the user hadn't returned when
    observation ended — a naive gap histogram drops these open
    spells and biases return rates up). x124 survives the LIFETIME
    (last − first day per subject); this is the complementary
    "probability of coming back after d days away" curve, with the
    discrete hazard h(d) = 10⁶·returns DIV at_risk added beside
    km_curve's product-limit surv_ppm. g13's cohort matrix and
    x176's gap CV² both read raw gaps and ignore the open final
    spell; the KM risk-set denominator makes this tail honest.

    Scale shape: one distinct (user, day) collapse, one per-user
    lead over active days (partitioned by user), then km_curve's
    duration-cell windows — bounded by the CALENDAR (≤ span distinct
    durations at any corpus size; the x124 allowance class).

    Reference parity: engine extension (SURVEY §2 retention family
    beside x124 lifetime KM / g13 / x193 user growth).
    """
    from m5_competition_kaggle_spark.operators.survival import (
        km_curve,
    )

    days = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(f"ts_nanos DIV {NANOS_PER_DAY}").alias("t"),
        )
        .distinct()
    )
    horizon = days.agg(F.max("t").alias("t_max"))
    w_next = Window.partitionBy("user_id").orderBy("t")
    spells = days.withColumn(
        "next_t", F.lead("t").over(w_next)
    ).crossJoin(F.broadcast(horizon))
    durations = spells.select(
        F.when(
            F.col("next_t").isNotNull(),
            F.col("next_t") - F.col("t"),
        )
        .otherwise(F.col("t_max") - F.col("t"))
        .alias("duration"),
        F.col("next_t").isNotNull().cast("int").alias("event"),
    )
    return (
        km_curve(durations)
        .select(
            F.col("t").alias("dur_days"),
            "n_risk",
            F.col("d").alias("n_returns"),
            F.expr(
                "CASE WHEN n_risk > 0 THEN"
                " (1000000 * d) DIV n_risk END"
            ).alias("hazard_ppm"),
            "surv_ppm",
        )
        .orderBy("dur_days")
    )


ORACLE_X214 = f"""
WITH days AS (
    SELECT DISTINCT user_id,
           epoch_ns(ts) // {NANOS_PER_DAY} AS t
    FROM events
),
horizon AS (SELECT max(t) AS t_max FROM days),
spells AS (
    SELECT t, lead(t) OVER (PARTITION BY user_id ORDER BY t)
               AS next_t
    FROM days
),
subj AS (
    SELECT CASE WHEN s.next_t IS NOT NULL THEN s.next_t - s.t
                ELSE h.t_max - s.t END AS duration,
           CASE WHEN s.next_t IS NOT NULL THEN 1 ELSE 0 END
               AS event
    FROM spells s CROSS JOIN horizon h
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
SELECT t AS dur_days, n_risk, d AS n_returns,
       CASE WHEN n_risk > 0 THEN (1000000 * d) // n_risk END
           AS hazard_ppm,
       surv_ppm
FROM curve WHERE d > 0 ORDER BY dur_days
"""


# --------------------------------------------------------------- x220


def x220_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Earth Mover's Distance (1-D Wasserstein) between each
    day's value distribution and the whole-corpus reference — the
    third gap geometry on the distribution-drift family: KS (x189 /
    s18) reads the WORST-point ECDF gap, CvM (x175/s26) the sum of
    SQUARED gaps, EMD the INTEGRAL of absolute gaps — the only one
    of the three that scales with HOW FAR the mass moved, not just
    that it moved (a +1-unit shift and a +100-unit shift have the
    same KS but 100× the EMD). Exact integers: EMD_1d =
    Σ_grid |A_d(q)·N_c − A_c(q)·N_d|·Δq cross-multiplied over the
    corpus value grid, normalized to emd_milli = 1000·Σ DIV
    (N_d·N_c) — thousandths of a value unit, bounded by 1000·range
    (no DIV wrap possible).

    Scale shape: one map-side-combining (day, q) count and one (q)
    count; the grid windows run over VALUE-range-bounded cells
    (corpus grid) and day×grid cells (calendar × range bounded) —
    never corpus rows. The corpus-grid cum/lead window is single-
    partition over range-bounded cells (the x209 allowance class).

    Reference parity: engine extension (SURVEY §2 drift family
    beside x189/x175/s18/s26).
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"ts_nanos DIV {NANOS_PER_DAY}").alias("day"),
        F.expr("CAST(round(value) AS BIGINT)").alias("q"),
    )
    day_cells = ev.groupBy("day", "q").agg(
        F.count(F.lit(1)).cast("long").alias("c_d")
    )
    corpus = ev.groupBy("q").agg(
        F.count(F.lit(1)).cast("long").alias("c_c")
    )
    w_corp = Window.orderBy("q")
    grid = corpus.select(
        "q",
        F.sum("c_c")
        .over(
            w_corp.rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("a_c"),
        F.coalesce(
            F.lead("q").over(w_corp) - F.col("q"),
            F.lit(0).cast("long"),
        ).alias("dq"),
    )
    n_c = corpus.agg(F.sum("c_c").alias("n_corpus"))
    days = day_cells.groupBy("day").agg(
        F.sum("c_d").alias("n_day")
    )
    dxg = (
        days.crossJoin(F.broadcast(grid))
        .join(day_cells, ["day", "q"], "left")
        .select(
            "day",
            "n_day",
            "q",
            "a_c",
            "dq",
            F.coalesce("c_d", F.lit(0).cast("long")).alias("c_d"),
        )
    )
    w_day = (
        Window.partitionBy("day")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = "decimal(38,0)"
    terms = dxg.withColumn(
        "a_d", F.sum("c_d").over(w_day)
    ).crossJoin(F.broadcast(n_c)).select(
        "day",
        "n_day",
        F.expr(
            f"CAST(abs(CAST(a_d AS {dec}) * n_corpus"
            f" - CAST(a_c AS {dec}) * n_day) * dq AS {dec})"
        ).alias("term"),
    )
    return (
        terms.groupBy("day", "n_day")
        .agg(F.sum("term").alias("__num"))
        .crossJoin(F.broadcast(n_c))
        .select(
            "day",
            "n_day",
            F.expr(
                "CAST((CAST(1000 AS DECIMAL(38,0)) * __num)"
                " DIV (CAST(n_day AS DECIMAL(38,0)) * n_corpus)"
                " AS BIGINT)"
            ).alias("emd_milli"),
        )
        .orderBy("day")
    )


ORACLE_X220 = f"""
WITH ev AS (
    SELECT epoch_ns(ts) // {NANOS_PER_DAY} AS day,
           CAST(round(value) AS BIGINT) AS q
    FROM events
),
day_cells AS (
    SELECT day, q, CAST(count(*) AS BIGINT) AS c_d
    FROM ev GROUP BY day, q
),
corpus AS (
    SELECT q, CAST(count(*) AS BIGINT) AS c_c FROM ev GROUP BY q
),
grid AS (
    SELECT q,
           CAST(sum(c_c) OVER (ORDER BY q
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS a_c,
           COALESCE(lead(q) OVER (ORDER BY q) - q, 0) AS dq
    FROM corpus
),
n_c AS (SELECT CAST(sum(c_c) AS BIGINT) AS n_corpus FROM corpus),
days AS (
    SELECT day, CAST(sum(c_d) AS BIGINT) AS n_day
    FROM day_cells GROUP BY day
),
dxg AS (
    SELECT d.day, d.n_day, g.q, g.a_c, g.dq,
           COALESCE(dc.c_d, 0) AS c_d
    FROM days d CROSS JOIN grid g
    LEFT JOIN day_cells dc ON dc.day = d.day AND dc.q = g.q
),
terms AS (
    SELECT day, n_day,
           abs(CAST(sum(c_d) OVER (PARTITION BY day ORDER BY q
                    ROWS UNBOUNDED PRECEDING) AS HUGEINT)
               * (SELECT n_corpus FROM n_c)
               - CAST(a_c AS HUGEINT) * n_day) * dq AS term
    FROM dxg
)
SELECT t.day, t.n_day,
       CAST((1000 * sum(t.term))
            // (CAST(t.n_day AS HUGEINT) * n.n_corpus) AS BIGINT)
           AS emd_milli
FROM terms t CROSS JOIN n_c n
GROUP BY t.day, t.n_day, n.n_corpus
ORDER BY t.day
"""


QUERIES = {
    "x188_dedup_weighted_stats": x188_dedup_weighted_stats,
    "x189_source_ks_matrix": x189_source_ks_matrix,
    "x190_diurnal_profile": x190_diurnal_profile,
    "s29_user_conversions": s29_user_conversions,
    "x201_degree_assortativity": x201_degree_assortativity,
    "x207_dedup_quality_shift": x207_dedup_quality_shift,
    "x214_km_hazard": x214_km_hazard,
    "x220_emd_drift": x220_emd_drift,
}

ORACLES = {
    "x188_dedup_weighted_stats": _dedup_weighted_oracle(),
    "x189_source_ks_matrix": ORACLE_X189,
    "x190_diurnal_profile": ORACLE_X190,
    "s29_user_conversions": ORACLE_S29,
    "x201_degree_assortativity": _x201_oracle(),
    "x207_dedup_quality_shift": _x207_oracle(),
    "x214_km_hazard": ORACLE_X214,
    "x220_emd_drift": ORACLE_X220,
}
