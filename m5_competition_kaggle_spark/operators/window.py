"""Series window operators (SURVEY §2 W1–W3) — the heart of the pipeline.

The reference computes these with pandas ``groupby(...).transform`` lambdas
over *implicit* frame order (reference ``pipeline.py:102-122,172-176``; the
order is a side effect of the melt at ``pipeline.py:47``). Spark makes the
order explicit — every helper here takes ``order_by`` and the caller must
pass a deterministic (tie-broken) ordering.

All helpers are pure column compositions: they stay inside whole-stage
codegen, shuffle once on the partition keys, and share a single Window
spec when stacked (e.g. 5 lags + 3 rolling means = ONE shuffle+sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def series_window(
    partition_by: Sequence[str], order_by: Sequence[str]
) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def lag_col(col: str, offset: int, w: WindowSpec) -> Column:
    """W1 — ``groupby(id)[col].shift(k)`` (reference ``pipeline.py:102-110``)."""
    return F.lag(col, offset).over(w)


def lead_col(col: str, offset: int, w: WindowSpec) -> Column:
    """W3 — ``groupby(id)[col].shift(-k)`` (reference ``pipeline.py:172-176``)."""
    return F.lead(col, offset).over(w)


def trailing_mean_col(
    col: str, window: int, w: WindowSpec, min_periods: int | None = None
) -> Column:
    """W2 — pandas ``x.shift(1).rolling(window).mean()`` with ``min_periods``
    semantics (reference ``pipeline.py:114-122``).

    pandas default ``min_periods == window`` ⇒ NULL until the trailing frame
    is completely full; Spark's window avg computes partial frames, so the
    count guard reproduces the semantics exactly (SURVEY §7.4 watch list).
    """
    mp = window if min_periods is None else min_periods
    frame = w.rowsBetween(-window, -1)
    avg = F.avg(col).over(frame)
    return F.when(F.count(col).over(frame) >= mp, avg).otherwise(F.lit(None))


def trailing_agg_col(
    col: str,
    window: int,
    w: WindowSpec,
    agg: str = "avg",
    min_periods: int | None = None,
) -> Column:
    """Generalized W2: any algebraic aggregate over the trailing
    ``[-window, -1]`` frame with the same pandas ``min_periods`` guard.
    ``agg`` ∈ {avg, sum, min, max, count}."""
    fns = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
           "count": F.count}
    if agg not in fns:
        raise ValueError(f"unsupported agg {agg!r}; choose {sorted(fns)}")
    mp = window if min_periods is None else min_periods
    frame = w.rowsBetween(-window, -1)
    val = fns[agg](col).over(frame)
    return F.when(F.count(col).over(frame) >= mp, val).otherwise(F.lit(None))


def with_lags(
    df: DataFrame,
    col: str,
    lags: Sequence[int],
    partition_by: Sequence[str],
    order_by: Sequence[str],
    name_fmt: str = "{col}_lag_{k}",
) -> DataFrame:
    """Attach one lag column per offset — single window spec, single shuffle."""
    w = series_window(partition_by, order_by)
    cols = {name_fmt.format(col=col, k=k): lag_col(col, k, w) for k in lags}
    return df.withColumns(cols)


def with_trailing_means(
    df: DataFrame,
    col: str,
    windows: Sequence[int],
    partition_by: Sequence[str],
    order_by: Sequence[str],
    name_fmt: str = "{col}_roll_mean_{k}",
    min_periods: int | None = None,
) -> DataFrame:
    w = series_window(partition_by, order_by)
    cols = {
        name_fmt.format(col=col, k=k): trailing_mean_col(col, k, w, min_periods)
        for k in windows
    }
    return df.withColumns(cols)


def with_lead(
    df: DataFrame,
    cols: Sequence[str],
    offset: int,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    name_fmt: str = "pred_{col}",
) -> DataFrame:
    """Attach the future-label columns (W3): value ``offset`` rows ahead."""
    w = series_window(partition_by, order_by)
    new = {name_fmt.format(col=c): lead_col(c, offset, w) for c in cols}
    return df.withColumns(new)
