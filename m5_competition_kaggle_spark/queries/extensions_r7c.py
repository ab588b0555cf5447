"""Round-7 queue, third batch — warehouse mutation, data quality,
survey sampling, graph communities, corpus drift.

- x102 MERGE (upsert/delete) with action accounting
  (``operators/merge.py``): the Delta/Iceberg mutation primitive as
  one full-outer join, certified through a deterministic change batch
  derived from the snapshot itself.
- x103 data-quality constraint report (Deequ-shape): completeness /
  uniqueness / range / domain / length checks as ONE pass over the
  table, one row per check with integer permille.
- x104 systematic weight-proportional sampling: the classic PPS survey
  design — midpoint selection grid over the cumulative-weight axis via
  the distributed prefix scan; exactly k selections, duplicates =
  items heavier than the stride (standard PPS semantics).
- x105 semi-supervised label propagation over the near-dup graph
  (``operators/graph_lpa.py``): 3 synchronous clamped-seed rounds,
  deterministic majority (count DESC, label ASC).
- x106 corpus vocabulary drift: per source, the integer-permille L1
  distance between the token distributions of the two corpus halves —
  the between-crawl drift monitor, exact rational arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.graph_lpa import (
    label_propagation,
)
from m5_competition_kaggle_spark.operators.merge import (
    ACTION_COL,
    merge_upsert,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

# ----------------------------------------------------------------- queries


def x102_merge_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a deterministic change batch into the orders snapshot:
    keys %7 update, %11 (and not %7) delete, %13 shifted-key insert.
    Output: per action the row count and merged price sum — the
    operationMetrics audit a production MERGE emits. One keyed
    full-outer shuffle."""
    snap = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.floor(F.col("o_totalprice") * F.lit(1_000_000))
        .cast("long")
        .alias("pm"),
    )
    mx = snap.agg(F.max("k").alias("mk"))
    updates = snap.filter(F.col("k") % 7 == 0).select(
        "k", F.lit("U").alias("op"), F.lit("X").alias("st"),
        (F.col("pm") + F.lit(1000)).alias("pm"),
    )
    deletes = snap.filter(
        (F.col("k") % 11 == 0) & (F.col("k") % 7 != 0)
    ).select(
        "k", F.lit("D").alias("op"), F.lit("").alias("st"),
        F.lit(0).cast("long").alias("pm"),
    )
    inserts = (
        snap.filter(F.col("k") % 13 == 0)
        .join(F.broadcast(mx))
        .select(
            (F.col("k") + F.col("mk")).alias("k"),
            F.lit("U").alias("op"),
            F.lit("N").alias("st"),
            F.lit(500_000).cast("long").alias("pm"),
        )
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    merged = merge_upsert(snap, changes, "k", ["st", "pm"])
    return (
        merged.groupBy(F.col(ACTION_COL).alias("action"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("pm").alias("sum_price_micro"),
        )
        .orderBy("action")
    )


def x103_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-shape data-quality report over documents: five constraint
    checks evaluated in ONE aggregate pass (each check a conditional
    count), unpivoted to (check, pass_cnt, fail_cnt, pass_permille).
    At 100 TB this is a single map-side-combinable scan."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    checks = docs.agg(
        n.alias("__n"),
        F.count("text").alias("c_text"),
        F.count("lang").alias("c_lang"),
        F.count("source").alias("c_source"),
        F.countDistinct("doc_id").alias("u_doc"),
        F.sum(
            F.when(
                (F.col("n_chars") >= 1) & (F.col("n_chars") <= 10000), 1
            ).otherwise(0)
        ).alias("r_chars"),
        F.sum(
            F.when(
                (F.length("lang") >= 2) & (F.length("lang") <= 5), 1
            ).otherwise(0)
        ).alias("d_lang"),
        F.sum(
            F.when(F.length("text") >= 10, 1).otherwise(0)
        ).alias("l_text"),
    )
    stacked = checks.select(
        F.col("__n"),
        F.expr(
            "stack(6,"
            " 'completeness_text', c_text,"
            " 'completeness_lang', c_lang,"
            " 'uniqueness_doc_id', u_doc,"
            " 'range_n_chars', r_chars,"
            " 'domain_lang_len', d_lang,"
            " 'min_text_len', l_text"
            ") AS (check, pass_cnt)"
        ),
    )
    return stacked.select(
        "check",
        F.col("pass_cnt").cast("long").alias("pass_cnt"),
        (F.col("__n") - F.col("pass_cnt")).cast("long").alias("fail_cnt"),
        F.expr("(1000 * pass_cnt) DIV __n").alias("pass_permille"),
    ).orderBy("check")


def x104_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: k = 100
    midpoints on the cumulative n_chars axis, each selecting the
    document whose weight interval contains it. The cumulative sum
    runs through the distributed two-phase prefix scan; the 100-point
    grid is the only broadcast. Duplicated docs = heavier than the
    stride (standard PPS)."""
    from m5_competition_kaggle_spark.operators.prefix import (
        global_running_sum,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    cum = global_running_sum(docs, "w", ("doc_id",), "cum")
    total = cum.agg(F.max("cum").alias("tw"))
    k = 100
    points = (
        spark.range(k)
        .select(F.col("id").alias("point_idx"))
        .join(F.broadcast(total))
        .select(
            "point_idx",
            F.expr(f"((2 * point_idx + 1) * tw) DIV {2 * k}").alias("p"),
        )
    )
    sel = cum.join(
        F.broadcast(points),
        (F.col("p") >= F.col("cum") - F.col("w"))
        & (F.col("p") < F.col("cum")),
    )
    return sel.select("point_idx", "doc_id", "w").orderBy("point_idx")


def x105_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised labels through the near-dup graph
    (``operators/graph_lpa.py``): every 4th document seeds with one of
    5 labels; 3 synchronous clamped rounds of deterministic majority
    adoption over the MinHash pair graph (threshold 0.7 for a denser
    graph than the dedup queries use)."""
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.7,
    ).select("id_a", "id_b")
    seeds = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.col("doc_id").alias("node"),
        (F.expr("doc_id DIV 4") % 5).cast("long").alias("label"),
    )
    return label_propagation(pairs, seeds, rounds=3).orderBy("node")


def x106_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary drift between two corpus halves (the A/B
    half is a HASH split — doc_id parity is degenerate on this fixture
    because source ≡ doc_id mod |sources|): integer-permille L1
    distance between token distributions, drift =
    1000·Σ|c1·N2 − c2·N1| DIV (2·N1·N2) — exact rational, no float
    probabilities. Two keyed aggregates over the token explode."""
    from m5_competition_kaggle_spark.functions.text import h64

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        (
            F.pmod(
                h64(F.concat(F.lit("half:"), F.col("doc_id").cast("string"))),
                F.lit(2),
            )
            == 0
        ).alias("h1"),
        F.explode(
            F.split(F.trim(F.col("text")), r"\s+")
        ).alias("token"),
    )
    per_tok = tok.groupBy("source", "token").agg(
        F.sum(F.when(F.col("h1"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(~F.col("h1"), 1).otherwise(0)).alias("c2"),
    )
    totals = per_tok.groupBy("source").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    return (
        per_tok.join(totals, "source")
        .groupBy("source")
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.sum(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            ).alias("__l1"),
        )
        .filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "source",
            "n1",
            "n2",
            F.expr("(1000 * __l1) DIV (2 * n1 * n2)").alias(
                "drift_permille"
            ),
        )
        .orderBy("source")
    )


QUERIES = {
    "x102_merge_actions": x102_merge_actions,
    "x103_dq_report": x103_dq_report,
    "x104_systematic_sample": x104_systematic_sample,
    "x105_label_propagation": x105_label_propagation,
    "x106_vocab_drift": x106_vocab_drift,
}

# ----------------------------------------------------------------- oracles

ORACLES: dict[str, str] = {}

ORACLES["x102_merge_actions"] = """
WITH snap AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                     CAST(FLOOR(o_totalprice * 1000000) AS BIGINT) AS pm
              FROM orders),
mx AS (SELECT max(k) AS mk FROM snap),
ch AS (
  SELECT k, 'U' AS op, 'X' AS st, pm + 1000 AS pm
  FROM snap WHERE k % 7 = 0
  UNION ALL
  SELECT k, 'D', '', CAST(0 AS BIGINT) FROM snap
  WHERE k % 11 = 0 AND k % 7 <> 0
  UNION ALL
  SELECT k + mk, 'U', 'N', CAST(500000 AS BIGINT)
  FROM snap CROSS JOIN mx WHERE k % 13 = 0
),
j AS (SELECT CASE WHEN c.k IS NULL THEN 'unchanged'
                  WHEN c.op = 'D' THEN 'delete'
                  WHEN s.k IS NULL THEN 'insert'
                  ELSE 'update' END AS action,
             CASE WHEN c.k IS NOT NULL AND c.op <> 'D' THEN c.pm
                  ELSE s.pm END AS pm
      FROM snap s FULL OUTER JOIN ch c ON c.k = s.k)
SELECT action, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(pm) AS BIGINT) AS sum_price_micro
FROM j GROUP BY action ORDER BY action
"""

ORACLES["x103_dq_report"] = """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
checks AS (
  SELECT 'completeness_text' AS "check",
         CAST(count(text) AS BIGINT) AS pass_cnt FROM documents
  UNION ALL
  SELECT 'completeness_lang', CAST(count(lang) AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'uniqueness_doc_id', CAST(count(DISTINCT doc_id) AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'range_n_chars',
         CAST(sum(CASE WHEN n_chars BETWEEN 1 AND 10000
                  THEN 1 ELSE 0 END) AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'domain_lang_len',
         CAST(sum(CASE WHEN length(lang) BETWEEN 2 AND 5
                  THEN 1 ELSE 0 END) AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'min_text_len',
         CAST(sum(CASE WHEN length(text) >= 10 THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM documents)
SELECT c."check", c.pass_cnt, n.n - c.pass_cnt AS fail_cnt,
       (1000 * c.pass_cnt) // n.n AS pass_permille
FROM checks c CROSS JOIN n ORDER BY c."check"
"""

ORACLES["x104_systematic_sample"] = """
WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents),
c AS (SELECT doc_id, w,
             CAST(sum(w) OVER (ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM d),
t AS (SELECT max(cum) AS tw FROM c),
pts AS (SELECT i AS point_idx, ((2 * i + 1) * t.tw) // 200 AS p
        FROM (SELECT unnest(range(0, 100)) AS i) CROSS JOIN t)
SELECT pts.point_idx, c.doc_id, c.w
FROM pts JOIN c ON pts.p >= c.cum - c.w AND pts.p < c.cum
ORDER BY pts.point_idx
"""


def _lpa_oracle(rounds: int) -> str:
    from m5_competition_kaggle_spark.queries.extensions import (
        _minhash_verified_ctes,
    )

    prev = "seeds"
    steps = []
    for r in range(rounds):
        steps.append(f"""
votes{r} AS (SELECT e.dst AS node, l.label,
                    count(*) AS c
             FROM edges e JOIN {prev} l ON l.node = e.src
             GROUP BY 1, 2),
adopt{r} AS (SELECT node, label FROM (
               SELECT *, row_number() OVER (PARTITION BY node
                           ORDER BY c DESC, label) AS r
               FROM votes{r})
             WHERE r = 1),
lab{r} AS MATERIALIZED (
    SELECT node, label FROM seeds
    UNION ALL
    SELECT a.node, a.label FROM adopt{r} a
    WHERE a.node NOT IN (SELECT node FROM seeds))""")
        prev = f"lab{r}"
    chain = ",".join(steps)
    return f"""
WITH {_minhash_verified_ctes(16, 4)},
vpairs AS MATERIALIZED (SELECT id_a, id_b FROM vstats
                        WHERE jaccard >= 0.7),
edges AS MATERIALIZED (
    SELECT id_a AS src, id_b AS dst FROM vpairs
    UNION
    SELECT id_b, id_a FROM vpairs),
seeds AS MATERIALIZED (
    SELECT doc_id AS node,
           CAST((doc_id // 4) % 5 AS BIGINT) AS label
    FROM documents WHERE doc_id % 4 = 0),
{chain}
SELECT node, label FROM {prev} ORDER BY node
"""


ORACLES["x105_label_propagation"] = _lpa_oracle(3)

_H64C = "CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"

ORACLES["x106_vocab_drift"] = rf"""
WITH tok AS (SELECT source,
                    {_H64C.format(s="'half:' || CAST(doc_id AS VARCHAR)")}
                        % 2 = 0 AS h1,
                    unnest(str_split_regex(trim(text), '\s+')) AS token
             FROM documents),
pt AS (SELECT source, token,
              CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
              CAST(sum(CASE WHEN h1 THEN 0 ELSE 1 END) AS BIGINT) AS c2
       FROM tok GROUP BY 1, 2),
tot AS (SELECT source, CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2
        FROM pt GROUP BY 1)
SELECT p.source, t.n1, t.n2,
       (1000 * CAST(sum(abs(p.c1 * t.n2 - p.c2 * t.n1)) AS BIGINT))
           // (2 * t.n1 * t.n2) AS drift_permille
FROM pt p JOIN tot t ON t.source = p.source
WHERE t.n1 > 0 AND t.n2 > 0
GROUP BY p.source, t.n1, t.n2
ORDER BY p.source
"""
