"""Skew-handling operators for hot keys at scale.

At 100 TB a handful of hot keys (one store, one viral document, one null
bucket) can stall a whole stage on one reducer. Two standard remedies,
composable with the rest of the operator library:

- ``salted_aggregate``: two-phase aggregation — pre-aggregate on
  (key, salt) so the hot key's rows split across ``salt_buckets``
  reducers, then combine the partials. Works for any algebraic aggregate
  (sum/count/min/max — avg via sum+count).
- ``salted_left_join``: replicate the (small-ish) right side per salt
  bucket and scatter the left side's hot keys across buckets; the join key
  becomes (key, salt) so one hot key fans across reducers.

AQE's skew-join splitting (enabled in session.py) handles many cases
automatically at runtime; these are for when you KNOW the key is hot —
deterministic plans beat runtime rescue.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: Sequence[str], buckets: int) -> Column:
    # deterministic per-row salt: hash of the whole row's key + a spread
    # column if provided; xxhash64 is stable across executors
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    agg_col: str,
    salt_buckets: int = 16,
    spread_cols: Sequence[str] | None = None,
) -> DataFrame:
    """sum/count of ``agg_col`` per key via two-phase salted aggregation.

    Phase 1 groups on (key, salt) — map-side combine already shrinks data,
    and the shuffle spreads each key over ``salt_buckets`` partitions.
    Phase 2 combines the tiny partials. Returns (key…, sum_<c>, count_<c>).
    """
    spread = list(spread_cols) if spread_cols else [agg_col]
    salted = df.withColumn("__salt", _salt_col(spread, salt_buckets))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.sum(agg_col).alias("__psum"),
        F.count(agg_col).alias("__pcnt"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__psum").alias(f"sum_{agg_col}"),
        F.sum("__pcnt").alias(f"count_{agg_col}"),
    )


def salted_left_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    spread_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi left join resilient to hot left-side keys: right side is
    replicated × ``salt_buckets`` (explode), left rows scatter by a
    deterministic salt, and the shuffle key becomes (key…, salt).

    Measured vs AQE (scripts/skew_bench.py, r7, 8M rows / 50%-hot key /
    100k-row right, local[32], best-of-3..5 over two runs): plain SMJ
    1.8–2.0 s; AQE OptimizeSkewedJoin with thresholds scaled so the
    split verifiably fires (join stage 32→43 tasks) 1.9–2.0 s — the
    read-side split alone recovered nothing at this scale; salted join
    1.27–1.46 s (~1.4×), with or without AQE on top. Use salting when
    the hot key is KNOWN and the right side is small enough to
    replicate ×salt_buckets (the cost model: |right|·salt_buckets extra
    rows through the shuffle); leave AQE skew-join enabled as the
    zero-knowledge backstop for skew you didn't predict — the two
    compose. For aggregation skew, see salted_aggregate's scoping:
    map-side partial aggregation is already the rescue there.
    """
    keys = list(on)
    spread = list(spread_cols) if spread_cols else [c for c in left.columns]
    salted_left = left.withColumn("__salt", _salt_col(spread, salt_buckets))
    replicated_right = right.withColumn(
        "__salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long")
            )
        ),
    )
    out = salted_left.join(replicated_right, keys + ["__salt"], "left")
    return out.drop("__salt")
