"""Forward as-of join with tolerance — the lookahead twin of
``operators/asof.py``.

Attach to every left row the EARLIEST right row with
``right.ts >= left.ts`` for the same key, optionally only if it arrives
within ``tolerance`` time units (next price tick after an order, first
error after a deploy event, next heartbeat after a probe).

Same union + cumulative-window technique as the backward operator —
tag both sides, union, one window sort per key — but with a FOLLOWING
frame and ``first(..., ignorenulls=True)``. One shuffle on the key,
O(|L| + |R|) work after the sort; an inequality join would materialize
O(|L| · match_width) candidates instead.

Tie rule: a right row at exactly left.ts IS visible (inclusive) — the
right side orders after the left at equal timestamps so it falls inside
the [current row, unbounded following] frame. The matched right
timestamp is returned (``matched_ts``), and with ``tolerance`` set,
matches farther than ``left.ts + tolerance`` are nulled out — the
window still finds the nearest following row first, so tolerance is a
post-filter, not a second scan. Integer timestamps keep the whole
operator engine-exact (x82).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of-forward join. ``right`` must contain ``on + [ts_col] +
    value_cols`` and be unique per (on, ts_col). Output: all left
    columns + ``matched_ts`` + ``value_cols`` (NULL when no right row
    follows within tolerance)."""
    keys = list(on)
    vals = list(value_cols)

    # All matched fields ride ONE struct so they provably come from the
    # SAME right row: a per-column first(..., ignorenulls=True) would,
    # for a right row with a NULL in one value column, take that column
    # from a LATER right row than matched_ts (ADVICE r6).
    r_side = right.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__side"),  # right sorts AFTER left at equal ts
        F.struct(
            F.col(ts_col).alias("__rts"),
            *[F.col(c) for c in vals],
        ).alias("__pack"),
    )
    l_side = left.withColumn("__side", F.lit(0)).withColumn(
        "__pack", F.lit(None).cast(r_side.schema["__pack"].dataType)
    )
    for c in left.columns:
        if c not in r_side.columns:
            r_side = r_side.withColumn(
                c, F.lit(None).cast(l_side.schema[c].dataType)
            )
    unioned = l_side.unionByName(r_side)

    # The [current row, unbounded following] frame would be
    # re-evaluated from scratch per row by WindowExec (O(n²) per
    # key); the REVERSED ordering turns it into the incremental
    # growing frame [unbounded preceding, current row] — identical
    # result, one O(n) pass after the sort.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.desc(ts_col), F.desc("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        F.last("__pack", ignorenulls=True).over(w).alias("__m"),
    ).filter(F.col("__side") == 0)

    in_tol = (
        F.lit(True)
        if tolerance is None
        else F.col("__m.__rts") <= F.col(ts_col) + F.lit(int(tolerance))
    )
    return filled.select(
        *[F.col(c) for c in left.columns],
        F.when(in_tol, F.col("__m.__rts")).alias("matched_ts"),
        *[F.when(in_tol, F.col(f"__m.{c}")).alias(c) for c in vals],
    )
