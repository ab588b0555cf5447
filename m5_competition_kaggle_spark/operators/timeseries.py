"""Time-series densification operators: calendar gap-fill and LOCF.

The reference's series are dense by construction (every (id, d) cell
exists in the wide sales matrix — SURVEY §1.3), so it never needs these;
any real event-sourced series does. Two composable pieces:

- ``gap_fill_days``: densify a per-(key, day) frame so every key has one
  row per calendar day between its own min and max day. The day rows are
  generated executor-side (``sequence`` + ``explode``) — no driver-side
  calendar, no cross join against a global dimension — so each key's
  expansion is local to its partition and the only shuffle is the span
  aggregate + the left join back (both keyed, map-side combinable /
  AQE-coalesced). At 100 TB the expansion factor is bounded by each
  key's own span, never by the global date range.

- ``locf``: last-observation-carried-forward in ONE window pass via
  ``last(col, ignorenulls=True)`` over an unbounded-preceding row frame
  — incremental per row, no per-gap rescans, partitioned by key so the
  sort is a grouped sort, not a global one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_days(
    df: DataFrame,
    keys: Sequence[str],
    day_col: str,
) -> DataFrame:
    """One row per key per calendar day spanning that key's observed
    [min(day), max(day)]; days absent from ``df`` get NULLs in all
    non-key, non-day columns."""
    keys = list(keys)
    span = df.groupBy(*keys).agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    days = span.select(
        *keys, F.explode(F.sequence("__d0", "__d1")).alias(day_col)
    )
    return days.join(df, keys + [day_col], "left")


def locf(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    col: str,
    out_col: str,
) -> DataFrame:
    """Fill NULLs in ``col`` with the most recent non-NULL value within
    ``keys`` ordered by ``order_col`` (rows before the first observation
    stay NULL)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(col, ignorenulls=True).over(w))
