"""As-of (backward) join — an operator Spark lacks natively.

Attach to every left row the most recent right row with
``right.ts <= left.ts`` for the same key (time-series point-in-time
lookup: price as of trade time, last feature snapshot before an event).

Implementation is the union + cumulative-window technique, NOT a range
join: tag both sides, union, and take ``last(value, ignorenulls=True)``
over (key, ts, side) with rows-unbounded-preceding — one shuffle on the
key, linear work, no per-row range probe. This scales where an inequality
join would explode: a range theta-join materializes O(|L|·match_width)
candidates, the union-window is O(|L| + |R|) after one sort.

Tie rule: a right row at exactly left.ts IS visible (inclusive, matching
DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` which takes the greatest
right.ts ≤ left.ts). Callers must make the right side unique per
(key, ts) — ambiguity at equal timestamps is undefined in every as-of
engine; dedupe first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Left as-of-backward join. ``right`` must contain ``on + [ts_col] +
    value_cols`` and be unique per (on, ts_col). Output: all left columns
    + ``value_cols`` (NULL when no right row precedes)."""
    keys = list(on)
    vals = list(value_cols)

    r_side = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in vals],
    )
    l_side = left.withColumn("__side", F.lit(1))
    for c in vals:
        if c not in left.columns:
            l_side = l_side.withColumn(c, F.lit(None).cast(r_side.schema[c].dataType))
    for c in left.columns:
        if c not in r_side.columns:
            r_side = r_side.withColumn(c, F.lit(None).cast(l_side.schema[c].dataType))
    unioned = l_side.unionByName(r_side)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in vals:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.filter(F.col("__side") == 1).drop("__side")
