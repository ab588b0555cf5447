"""Zone-map (data-skipping) effectiveness certificates.

x43 certifies the Morton/Z-order KEY arithmetic bit-for-bit; this
module certifies the PAYOFF: lay the same rows out in blocks under two
sort orders, compute each block's min/max envelope on the predicate
dimensions (exactly the per-row-group statistics Parquet writes and
Delta/Iceberg zone maps index), and count how many blocks a 2-D range
predicate can prune without reading. On 100 TB this is the difference
between scanning every file and scanning the handful whose envelopes
straddle the predicate — `repartitionByRange(zkey) +
sortWithinPartitions(zkey)` at write time is the production move this
measures.

Scale shape: block ids come from a GLOBAL rank in the layout's sort
order, computed with the two-phase distributed prefix scan
(``operators/prefix.py::global_running_sum`` — range partition, local
scan, tiny per-partition offsets broadcast back), never a
single-partition window. Everything downstream is one keyed aggregate
per (layout, block) plus a count — integers end to end, so the oracle
hash-certifies the pruning fractions (x109).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.prefix import global_running_sum


def zone_map_blocks(
    df: DataFrame,
    order_cols: Sequence[str],
    dim_cols: Sequence[str],
    block_size: int,
) -> DataFrame:
    """Per-block min/max envelopes for ``dim_cols`` when ``df`` is laid
    out in ``order_cols`` order with ``block_size`` rows per block.

    ``order_cols`` must be a unique key (a deterministic layout needs a
    total order). Output: block (0-based), n_rows, and min_<d>/max_<d>
    per dimension.
    """
    if int(block_size) < 1:
        raise ValueError(f"block_size must be >= 1 (got {block_size})")
    # rank = global running sum of 1 in layout order (two-phase scan)
    with_one = df.select(
        *order_cols, *dim_cols, F.lit(1).alias("__one")
    )
    ranked = global_running_sum(
        with_one, "__one", tuple(order_cols), out_col="__rank"
    )
    blocks = ranked.withColumn(
        "block", F.expr(f"(__rank - 1) DIV {int(block_size)}")
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for d in dim_cols:
        aggs += [F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}")]
    return blocks.groupBy("block").agg(*aggs)


def pruning_stats(
    blocks: DataFrame,
    predicates: dict[str, tuple[int, int]],
) -> DataFrame:
    """Fraction of blocks a conjunctive 2-sided range predicate prunes,
    given ``zone_map_blocks`` output. ``predicates`` maps dim -> (lo,
    hi) inclusive. A block is prunable when ANY dimension's envelope
    lies entirely outside its range — the standard zone-map test (no
    false pruning possible: envelope disjoint from range implies no
    qualifying row). Output: one row — n_blocks, n_pruned,
    pruned_permille, rows_total, rows_skipped.
    """
    prune = F.lit(False)
    for d, (lo, hi) in predicates.items():
        prune = prune | (F.col(f"max_{d}") < F.lit(int(lo))) \
            | (F.col(f"min_{d}") > F.lit(int(hi)))
    flagged = blocks.withColumn("__pruned", prune.cast("long"))
    return flagged.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("__pruned").alias("n_pruned"),
        F.expr(
            "(1000 * sum(__pruned)) DIV count(1)"
        ).alias("pruned_permille"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(F.col("n_rows") * F.col("__pruned")).alias("rows_skipped"),
    )
