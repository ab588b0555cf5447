"""Relational operators (SURVEY §2 P1–P7, J1–J3, A1–A3, O1–O3).

These are thin, semantics-preserving wrappers over the DataFrame API — the
point is to pin the reference's semantics (left-outer joins, between
filters, column-set-difference projection) in one audited place, not to
re-implement what Catalyst already optimizes. Each docstring cites the
reference behavior it reproduces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_eq(df: DataFrame, col: str, value) -> DataFrame:
    """P1 — ``df[df.col == v]`` (``pipeline.py:35``). If the source is
    written ``partitionBy(col)`` this becomes partition pruning."""
    return df.filter(F.col(col) == F.lit(value))


def filter_between(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """P2 — inclusive range filter (``pipeline.py:152-161``)."""
    return df.filter(F.col(col).between(lo, hi))


def filter_not_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P3 — ``df[df.c.notnull()]`` (``pipeline.py:72,177``)."""
    out = df
    for c in cols:
        out = out.filter(F.col(c).isNotNull())
    return out


def project_without(df: DataFrame, drop_cols: Sequence[str]) -> DataFrame:
    """P5 — column drop (``pipeline.py:87-97``). Catalyst prunes unused
    columns anyway; this keeps the schema contract explicit."""
    return df.drop(*drop_cols)


def select_new_columns(
    feature_df: DataFrame, base_df: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """P6 — column-set-difference projection before a feature join
    (``pipeline.py:162-168``): keep keys + columns base doesn't have."""
    keep = list(key_cols) + [
        c for c in feature_df.columns
        if c not in base_df.columns and c not in key_cols
    ]
    return feature_df.select(*keep)


def left_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    broadcast_right: bool = False,
) -> DataFrame:
    """J1–J3 — equi left-outer join, the only join family in the reference
    (``pipeline.py:60,66,165-169``). ``broadcast_right=True`` for bounded
    dimensions (calendar = 1,969 rows — broadcast at any scale factor)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, list(on), "left")


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """O2 — ``pd.concat`` (``pipeline.py:339-348``), by-name union so column
    order differences can't silently misalign."""
    from functools import reduce

    return reduce(DataFrame.unionByName, dfs)


def ordered(df: DataFrame, by: Sequence[str]) -> DataFrame:
    """O1 — global multi-key sort (``pipeline.py:349-351``); plans as a
    range-partitioned sort (sampling pass + per-partition sort)."""
    return df.orderBy(*by)


def last_n_distinct_min(df: DataFrame, col: str, n: int) -> DataFrame:
    """A1+A2+O3 — ``min(sorted(df.col.unique())[-n:])`` (``pipeline.py:245-246``):
    the N-th-from-last distinct value, used as the temporal-split cutoff.

    distinct → orderBy desc → limit n → min. The distinct aggregates
    map-side first, so the shuffle carries only unique values.
    """
    return (
        df.select(col).distinct().orderBy(F.desc(col)).limit(n)
        .agg(F.min(col).alias(f"min_{col}"))
    )
