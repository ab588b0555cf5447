"""Deterministic Count-Min Sketch — the frequency member of the
from-scratch sketch family (x45 HyperLogLog = distinct counts, x46/x48
Bloom = membership, this = per-item frequency).

A CMS is a D×W grid of counters; item updates add 1 to one cell per
row d at ``pos_d(item)``, and a point estimate is ``min_d
cell[d][pos_d]`` — an overestimate, never an underestimate, with error
≤ N/W at depth-fold confidence. Two properties make it the right
frequency sketch for a 100 TB corpus on Spark:

- **Fixed state**: the sketch is ≤ D·W cells per group no matter the
  corpus (like x45's register table) — the groupBy collapses map-side
  to at most D·W partial cells per task before any exchange.
- **A true monoid**: cells are plain sums, so sketch(A ⊎ B) is the
  cell-wise sum of sketch(A) and sketch(B) in ANY merge order —
  shuffle- and partitioning-independent by construction
  (property-tested), and incrementally maintainable.

Determinism: positions derive from ONE ``h64`` per item via the same
integer double-hashing as the Bloom filter (h1 = low 30 bits, h2 =
high bits forced odd, pos_d = (h1 + d·h2) mod W) — every cell and
estimate is pure int64 arithmetic a SQL engine replays bit-for-bit
(x50 hash-certifies build + estimate end to end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.curation import h64_sql

CMS_D = 4      # depth: independent hash rows
CMS_W = 1024   # width: counters per row


def _probe_structs(item_col: str, d: int = CMS_D, w: int = CMS_W) -> Column:
    """array<struct<d:int, pos:int>> — the item's one cell per row."""
    h = h64_sql(item_col)
    return F.expr(
        "array("
        + ", ".join(
            f"named_struct('d', {i}, 'pos', cast(pmod((({h}) % {1 << 30})"
            f" + {i} * ((({h}) div {1 << 30}) * 2 + 1), {w}) as int))"
            for i in range(d)
        )
        + ")"
    )


def cms_build(
    items: DataFrame,
    item_col: str,
    group_cols: tuple[str, ...] = (),
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch cells (group..., d, pos, cnt) from one row per item
    OCCURRENCE — or, with ``weight_col``, one row per item carrying
    its occurrence count (a pre-aggregated term-frequency table):
    cells are plain sums, so the weighted build is cell-for-cell
    identical to the per-occurrence build over the expanded input
    (the monoid property the module docstring states; property-tested
    in tests/test_cms.py). Output ≤ D·W rows per group regardless of
    input size; the aggregation is map-side combinable."""
    probes = items.select(
        *group_cols,
        *([weight_col] if weight_col else []),
        F.explode(_probe_structs(item_col)).alias("__p"),
    ).select(
        *group_cols,
        *([weight_col] if weight_col else []),
        "__p.d", "__p.pos",
    )
    return probes.groupBy(*group_cols, "d", "pos").agg(
        (
            F.sum(weight_col) if weight_col else F.count(F.lit(1))
        ).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    group_cols: tuple[str, ...] = (),
    out_col: str = "est_cnt",
) -> DataFrame:
    """Point estimates: per query item, ``min_d`` of its D cells.

    The join is a keyed equi-join on (group, d, pos) against a table
    bounded by D·W rows per group — broadcastable at any corpus size.
    A missing cell means no item ever touched it → count 0.
    """
    probes = queries.select(
        *group_cols,
        F.col(item_col),
        F.explode(_probe_structs(item_col)).alias("__p"),
    ).select(*group_cols, item_col, "__p.d", "__p.pos")
    joined = probes.join(
        F.broadcast(sketch), [*group_cols, "d", "pos"], "left"
    )
    return joined.groupBy(*group_cols, item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col)
    )
