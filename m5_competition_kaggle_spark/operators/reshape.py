"""Reshape operators (SURVEY §2 R1–R3): unpivot, pivot, keyed update.

Reference semantics: ``pd.melt`` (``pipeline.py:46-48``), ``pivot_table``
with mean agg (``pipeline.py:374-376``), and ``DataFrame.update``'s
non-NULL-overwrites-only overlay (``pipeline.py:377-378``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """R1 — wide→long melt.

    Uses native ``DataFrame.unpivot`` (Spark ≥3.4), which plans as a single
    Expand node: each input row fans out to ``len(value_cols)`` rows in one
    narrow (no-shuffle) pass. For the reference's 1,941-day-wide table the
    Expand projection list is large but constant-folded once at planning
    time (SURVEY §7.4 wide-unpivot watch item).
    """
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)


def unpivot_via_stack(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """R1 alternative as an explicit ``stack`` expression — kept as the
    fallback path for engines/versions without native unpivot, and to chunk
    extremely wide inputs if plan analysis ever becomes the bottleneck."""
    n = len(value_cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stacked = df.selectExpr(
        *[f"`{c}`" for c in id_cols],
        f"stack({n}, {pairs}) as ({var_name}, {value_name})",
    )
    return stacked


def pivot_avg(
    df: DataFrame,
    index_col: str,
    pivot_col: str,
    value_col: str,
    pivot_values: Sequence[str],
) -> DataFrame:
    """R2/A4 — ``pivot_table(values=…, index=…, columns=…)`` with the pandas
    default **mean** aggfunc (``pipeline.py:374-376``).

    ``pivot_values`` is explicit: deterministic column order AND a
    single-pass plan (without it Spark first runs a distinct query to
    discover the values — an extra job at scale).
    """
    return (
        df.groupBy(index_col)
        .pivot(pivot_col, list(pivot_values))
        .agg(F.avg(value_col))
    )


def keyed_update(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    update_cols: Sequence[str],
) -> DataFrame:
    """R3 — pandas ``DataFrame.update`` overlay (``pipeline.py:377-378``):
    for matching keys, non-NULL new values overwrite; everything else (and
    all unmatched base rows) is preserved.

    Plan: left join on the keys + per-column ``coalesce(new, old)``. The
    NULL rule matters — pandas ``update`` never writes NaN over data
    (SURVEY §7.4), hence coalesce rather than plain overwrite.
    """
    keys = list(key_cols)
    upd = updates.select(
        *keys, *[F.col(c).alias(f"__upd_{c}") for c in update_cols]
    )
    joined = base.join(upd, keys, "left")
    out_cols = []
    for c in base.columns:
        if c in update_cols:
            out_cols.append(F.coalesce(F.col(f"__upd_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)
