"""Change-data-capture shaping: gaps-and-islands compression and SCD2
validity ranges.

The warehouse-side twin of ``operators/reshape.py``'s keyed-update
overlay: where ``keyed_update`` applies the latest state, these
operators RECONSTRUCT state history from an append-only event log —
collapse consecutive rows carrying the same attribute value into one
"island" (dropping no-op updates) and emit slowly-changing-dimension
type-2 rows with ``valid_from`` / ``valid_to`` bounds.

Classic pattern (Kimball SCD2; the gaps-and-islands idiom): flag a
change whenever the attribute differs from its predecessor, running-sum
the flags into an island id, then one GROUP BY per (key, island). Cost
at scale: exactly ONE shuffle on the entity key — the change flag, the
running sum, and the island bounds all ride the same
``partitionBy(key) ORDER BY ts`` window sort, and the final aggregate
is partial-aggregatable. Integer timestamps (epoch nanos) keep the
whole thing engine-exact (x74).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_islands(
    df: DataFrame,
    key_col: str,
    order_col: str,
    attr_col: str,
) -> DataFrame:
    """Collapse consecutive equal-``attr_col`` runs per key into islands.

    ``order_col`` must be a total order within each key (pass an integer
    timestamp; ties must be pre-broken). Output one row per island:
    key, island (1-based, chronological), attr value, n_rows,
    valid_from = first order value, valid_to = next island's
    valid_from (NULL for the current/open island).
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    # Null-safe change detection (ADVICE r6): `lag != attr` evaluates
    # to NULL across a non-null -> NULL transition, silently absorbing
    # NULL-attr rows into the previous island. eqNullSafe treats NULL
    # as a value; the explicit row_number()==1 test opens the first
    # island even when its attr is NULL (lag NULL eqNullSafe attr NULL
    # would otherwise read as "no change").
    flagged = df.select(key_col, order_col, attr_col).withColumn(
        "__chg",
        F.when(
            (F.row_number().over(w) == 1)
            | ~F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "__island",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    grouped = islands.groupBy(key_col, "__island").agg(
        F.min(attr_col).alias(attr_col),  # constant within the island
        F.count(F.lit(1)).alias("n_rows"),
        F.min(order_col).alias("valid_from"),
    )
    w_isl = Window.partitionBy(key_col).orderBy("__island")
    return grouped.select(
        key_col,
        F.col("__island").alias("island"),
        attr_col,
        "n_rows",
        "valid_from",
        F.lead("valid_from").over(w_isl).alias("valid_to"),
    )
