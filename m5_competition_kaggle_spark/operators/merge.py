"""MERGE (upsert + delete) semantics — the warehouse mutation primitive.

Spark's DataFrame API has no MERGE statement outside Delta/Iceberg;
the underlying algebra is one FULL OUTER join between the snapshot and
the change batch, classified row-by-row:

    change row, key absent  → INSERT
    change row, key present → UPDATE (or DELETE when op = 'D')
    no change row           → UNCHANGED (carried forward)

This operator returns BOTH the merged snapshot and per-action
bookkeeping — the audit trail a production MERGE emits (Delta's
operationMetrics). One keyed shuffle (the outer join); the change
batch is usually a small fraction of the snapshot, so AQE picks a
broadcast where it fits.

Contract: ``changes`` must be unique per key (dedupe upstream — the
standard MERGE precondition; ambiguous matches are an error in every
MERGE engine). Column values are carried as-is, so integer snapshots
certify hash-exact through a SQL twin (x102).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTION_COL = "__action"


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    value_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Merged snapshot + action column.

    ``changes`` carries (key_col, op_col ('U' upsert / 'D' delete),
    *value_cols); the result carries (key_col, *value_cols, __action ∈
    {'insert','update','delete','unchanged'}) with delete rows RETAINED
    (flagged) so callers can both count them and filter them out.
    """
    vals = list(value_cols)
    s = snapshot.select(
        F.col(key_col),
        *[F.col(c).alias(f"__s_{c}") for c in vals],
        F.lit(True).alias("__in_s"),
    )
    # An op outside {'U','D'} (or NULL) would silently classify as an
    # update/insert while three-valued logic makes the value columns
    # fall back to the SNAPSHOT side — an inserted row with all-NULL
    # values. Every MERGE engine rejects an unknown action; so do we.
    op_checked = F.when(
        F.col(op_col).isin("U", "D"), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("merge_upsert: op must be 'U' or 'D', got "),
                F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    c = changes.select(
        F.col(key_col),
        op_checked.alias("__op"),
        *[F.col(c_).alias(f"__c_{c_}") for c_ in vals],
        F.lit(True).alias("__in_c"),
    )
    j = s.join(c, key_col, "full_outer")
    action = (
        F.when(F.col("__in_c").isNull(), F.lit("unchanged"))
        .when(F.col("__op") == "D", F.lit("delete"))
        .when(F.col("__in_s").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    merged_vals = [
        F.when(
            F.col("__in_c").isNotNull() & (F.col("__op") != "D"),
            F.col(f"__c_{v}"),
        )
        .otherwise(F.col(f"__s_{v}"))
        .alias(v)
        for v in vals
    ]
    return j.select(F.col(key_col), *merged_vals, action.alias(ACTION_COL))
