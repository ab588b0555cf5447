"""Round-8 queue — dependence, community-vs-chance, and data-skipping
certificates. Registered BEHIND the r7 window (the head-50 is fully
booked with the 24 promotions + 26 second-green picks); these certify
locally this round and enter the r8 driver window.

- x107 mutual information between event type and hour-of-day
  (``operators/infotheory.py``): the feature-selection / leakage
  screen — contingency cells bounded by |X|·|Y|, marginals as keyed
  window sums over the cell table, per-cell weighted PMI in nats as
  the same double expression tree in both engines (x32/x63 rounding
  precedent).
- x108 source-partition modularity of the MinHash near-dup graph
  (``operators/modularity.py``): "is duplication within crawls or
  across them", calibrated against the degree-preserving random
  graph; scaled by 4m² the whole measure is exact int64 (zero
  floats), so every per-source term hash-certifies.
- x109 zone-map pruning certificate (``operators/layout.py``): lays
  the SAME orders out naturally vs Z-ordered (x43's key), computes
  per-100-row-block min/max envelopes through the distributed prefix
  scan, and counts the blocks a 2-D range predicate skips under each
  layout — the measured payoff of `repartitionByRange(zkey)` at write
  time, certified as exact integer pruning fractions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.infotheory import (
    mutual_information_cells,
)
from m5_competition_kaggle_spark.operators.layout import (
    pruning_stats,
    zone_map_blocks,
)
from m5_competition_kaggle_spark.operators.modularity import (
    partition_modularity,
)
from m5_competition_kaggle_spark.queries.extensions import (
    _minhash_verified_ctes,
    _zorder_terms,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

HOUR_NANOS = 3_600_000_000_000
ZB = 6  # 6-bit dims for the zone-map demo: values 0..63
BLOCK = 100
PRED_LO, PRED_HI = 8, 23

# ----------------------------------------------------------------- queries


def x107_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI(event_type; hour-of-day) cell table over events: c_xy/c_x/
    c_y/n exact int64, mi_term the weighted PMI in nats (double, same
    literal expression both engines). Output bounded by 5 types × 24
    hours; summing mi_term gives MI — the whole dependence structure
    certifies, not just the scalar."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("etype"),
        F.expr(f"(ts_nanos DIV {HOUR_NANOS}) % 24").alias("hour"),
    )
    return (
        mutual_information_cells(ev, "etype", "hour")
        .select("x", "y", "c_xy", "c_x", "c_y", "n", "mi_term")
        .orderBy("x", "y")
    )


def x108_source_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity terms of the SOURCE partition over the verified
    MinHash-LSH near-dup graph (x2's operator, x65/x66's edge list):
    per source L_c, d_c, m and q_term_4m2 = 4m·L_c − d_c² — exact
    int64; Q = Σ q_term / 4m². High Q ⇒ per-source dedup suffices;
    low Q ⇒ cross-source dedup is mandatory."""
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.8,
    ).select("id_a", "id_b")
    assign = docs.select(
        F.col("doc_id").alias("node"), F.col("source").alias("part")
    )
    return (
        partition_modularity(edges, assign)
        .select(
            F.col("part").alias("source"),
            "n_intra", "d_sum", "m", "q_term_4m2",
        )
        .orderBy("source")
    )


def x109_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning under natural vs Z-order layout: per-100-row
    blocks of orders (dims = custkey%64, order-day%64), min/max
    envelopes via the distributed prefix-scan rank, and the block/row
    skip counts for the predicate both-dims ∈ [8, 23]. Two rows out;
    the Z-ordered layout's pruned_permille is the certified payoff of
    x43's key."""
    o = load_table(spark, sf_dir, "orders")
    zexpr = _zorder_terms(
        "za", "da", ZB, "shiftleft({x}, {n})", "shiftright({x}, {n})"
    )
    dims = o.select(
        "o_orderkey",
        F.expr(f"o_custkey % {1 << ZB}").cast("long").alias("za"),
        F.expr(
            f"datediff(o_orderdate, DATE'1992-01-01') % {1 << ZB}"
        ).cast("long").alias("da"),
    ).withColumn("zkey", F.expr(zexpr).cast("long"))

    preds = {"za": (PRED_LO, PRED_HI), "da": (PRED_LO, PRED_HI)}
    natural = pruning_stats(
        zone_map_blocks(dims, ["o_orderkey"], ["za", "da"], BLOCK), preds
    ).withColumn("layout", F.lit("natural"))
    zordered = pruning_stats(
        zone_map_blocks(dims, ["zkey", "o_orderkey"], ["za", "da"], BLOCK),
        preds,
    ).withColumn("layout", F.lit("zorder"))
    cols = [
        "layout", "n_blocks", "n_pruned", "pruned_permille",
        "rows_total", "rows_skipped",
    ]
    return natural.select(cols).unionAll(
        zordered.select(cols)
    ).orderBy("layout")


QUERIES = {
    "x107_mutual_info": x107_mutual_info,
    "x108_source_modularity": x108_source_modularity,
    "x109_zone_map_pruning": x109_zone_map_pruning,
}

ORACLES: dict[str, str] = {}

ORACLES["x107_mutual_info"] = f"""
WITH ev AS (
    SELECT event_type AS x,
           (epoch_ns(ts) // {HOUR_NANOS}) % 24 AS y
    FROM events
),
cells AS (
    SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy
    FROM ev GROUP BY x, y
),
marg AS (
    SELECT x, y, c_xy,
           CAST(sum(c_xy) OVER (PARTITION BY x) AS BIGINT) AS c_x,
           CAST(sum(c_xy) OVER (PARTITION BY y) AS BIGINT) AS c_y
    FROM cells
),
tot AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM cells)
SELECT x, y, c_xy, c_x, c_y, n,
       (CAST(c_xy AS DOUBLE) / n)
         * ln(CAST(n AS DOUBLE) * c_xy
              / (CAST(c_x AS DOUBLE) * c_y)) AS mi_term
FROM marg CROSS JOIN tot
ORDER BY x, y
"""

ORACLES["x108_source_modularity"] = f"""
WITH {_minhash_verified_ctes(16, 4)},
edges AS MATERIALIZED (
    SELECT DISTINCT least(id_a, id_b) AS id_a,
                    greatest(id_a, id_b) AS id_b
    FROM vstats WHERE jaccard >= 0.8 AND id_a <> id_b
),
tagged AS MATERIALIZED (
    SELECT e.id_a, e.id_b, da.source AS part_a, db.source AS part_b
    FROM edges e
    JOIN documents da ON da.doc_id = e.id_a
    JOIN documents db ON db.doc_id = e.id_b
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM tagged),
intra AS (
    SELECT part_a AS part, CAST(count(*) AS BIGINT) AS n_intra
    FROM tagged WHERE part_a = part_b GROUP BY part_a
),
deg AS (
    SELECT part, CAST(count(*) AS BIGINT) AS d_sum
    FROM (SELECT part_a AS part FROM tagged
          UNION ALL SELECT part_b FROM tagged)
    GROUP BY part
)
SELECT deg.part AS source,
       CAST(coalesce(intra.n_intra, 0) AS BIGINT) AS n_intra,
       deg.d_sum,
       m.m,
       CAST(4 * m.m * coalesce(intra.n_intra, 0)
            - deg.d_sum * deg.d_sum AS BIGINT) AS q_term_4m2
FROM deg LEFT JOIN intra ON intra.part = deg.part
CROSS JOIN m
ORDER BY source
"""

_Z_SQL = _zorder_terms("za", "da", ZB, "(({x}) << {n})", "(({x}) >> {n})")

ORACLES["x109_zone_map_pruning"] = f"""
WITH dims AS (
    SELECT o_orderkey,
           CAST(o_custkey % {1 << ZB} AS BIGINT) AS za,
           CAST(datediff('day', DATE '1992-01-01', o_orderdate)
                % {1 << ZB} AS BIGINT) AS da
    FROM orders
),
keyed AS (SELECT *, CAST({_Z_SQL} AS BIGINT) AS zkey FROM dims),
nat AS (
    SELECT (row_number() OVER (ORDER BY o_orderkey) - 1) // {BLOCK}
               AS block, za, da
    FROM keyed
),
zo AS (
    SELECT (row_number() OVER (ORDER BY zkey, o_orderkey) - 1) // {BLOCK}
               AS block, za, da
    FROM keyed
),
natb AS (
    SELECT block, CAST(count(*) AS BIGINT) AS n_rows,
           min(za) AS min_za, max(za) AS max_za,
           min(da) AS min_da, max(da) AS max_da
    FROM nat GROUP BY block
),
zob AS (
    SELECT block, CAST(count(*) AS BIGINT) AS n_rows,
           min(za) AS min_za, max(za) AS max_za,
           min(da) AS min_da, max(da) AS max_da
    FROM zo GROUP BY block
),
stats AS (
    SELECT 'natural' AS layout,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(CASE WHEN max_za < {PRED_LO} OR min_za > {PRED_HI}
                         OR max_da < {PRED_LO} OR min_da > {PRED_HI}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
           CAST(sum(n_rows) AS BIGINT) AS rows_total,
           CAST(sum(CASE WHEN max_za < {PRED_LO} OR min_za > {PRED_HI}
                         OR max_da < {PRED_LO} OR min_da > {PRED_HI}
                    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped
    FROM natb
    UNION ALL
    SELECT 'zorder',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN max_za < {PRED_LO} OR min_za > {PRED_HI}
                         OR max_da < {PRED_LO} OR min_da > {PRED_HI}
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(n_rows) AS BIGINT),
           CAST(sum(CASE WHEN max_za < {PRED_LO} OR min_za > {PRED_HI}
                         OR max_da < {PRED_LO} OR min_da > {PRED_HI}
                    THEN n_rows ELSE 0 END) AS BIGINT)
    FROM zob
)
SELECT layout, n_blocks, n_pruned,
       CAST((1000 * n_pruned) // n_blocks AS BIGINT) AS pruned_permille,
       rows_total, rows_skipped
FROM stats
ORDER BY layout
"""
