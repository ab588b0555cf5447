"""Streaming interval join: live points vs static windows.

The streaming twin of ``operators/interval.py``: the bucket expansion
that turns ``s <= t < e`` into an equi-join is STATELESS on the stream
side (one bucket per point), and the interval side is static and
pre-expanded — so the probe is a stream-static equi-join with the
exact-range filter applied after, no state at all. Any downstream
per-interval aggregation is one ordinary streaming aggregate.

The common production ask this covers: match an event stream to
maintenance windows / incident windows / campaign flights as events
arrive, without a nested-loop join (which structured streaming would
reject outright for a stream-static BETWEEN join at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expanded_intervals(
    intervals: DataFrame, start_col: str, end_col: str, bucket_width: int
) -> DataFrame:
    """Static side, precomputed once: one row per (interval, bucket)."""
    g = F.lit(int(bucket_width))
    # Same guard as operators/interval.py: end <= start matches nothing
    # under the half-open contract, and F.sequence would otherwise step
    # -1 into an unbounded descending bucket list on a dirty row.
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    return intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / g),
                F.floor((F.col(end_col) - F.lit(1)) / g),
            )
        ),
    )


def streaming_interval_join(
    points: DataFrame,
    expanded: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Stream-static inner join: each streaming point against every
    interval containing it. ``expanded`` comes from
    :func:`expanded_intervals` with the SAME bucket_width."""
    g = F.lit(int(bucket_width))
    p = points.withColumn("__bucket", F.floor(F.col(point_ts) / g))
    return (
        p.join(expanded, "__bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__bucket")
    )
