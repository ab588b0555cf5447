"""Bloom-filtered semi-join — the runtime-filter / join-pruning pattern.

At 100 TB the dominant cost of ``fact ⋈ selective_dim`` is shuffling
fact rows that will NOT match. The standard fix (Spark's own runtime
row-group filters, Iceberg bloom indexes) is to condense the build
side's keys into a tiny bit set, broadcast it, and drop non-matching
probe rows BEFORE the shuffle. This module implements the pattern with
engine-portable integer hashing (double-hashed h64, the x46 technique
generalized from shingles to arbitrary join keys):

- ``bloom_bits``: k=2 bit positions per build key, deduplicated — at
  most ``2·|build|`` (≤ m) integers to broadcast, independent of the
  probe side's size.
- ``bloom_semi_filter``: probe rows survive iff BOTH their positions
  are set — two broadcast semi-joins, map-side, zero shuffle of the
  probe table. False positives pass (by design), false negatives are
  IMPOSSIBLE, so composing with the exact join afterwards returns
  exactly the plain join's answer — which is what the certified query
  (x95) proves bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.text import h64

M_BITS_DEFAULT = 1 << 14


def _pos(key: Column, salt: str, m: int) -> Column:
    return F.pmod(h64(F.concat(F.lit(salt), key.cast("string"))), F.lit(m))


def bloom_bits(
    build: DataFrame, key_col: str, m_bits: int = M_BITS_DEFAULT
) -> DataFrame:
    """Distinct set-bit positions (column ``bit``) for the build keys."""
    k = F.col(key_col)
    return (
        build.select(_pos(k, "b1:", m_bits).alias("bit"))
        .unionAll(build.select(_pos(k, "b2:", m_bits).alias("bit")))
        .distinct()
    )


def bloom_semi_filter(
    probe: DataFrame,
    bits: DataFrame,
    key_col: str,
    m_bits: int = M_BITS_DEFAULT,
) -> DataFrame:
    """Probe rows whose key passes the bloom test (no false negatives).
    ``bits`` comes from :func:`bloom_bits` with the SAME m_bits."""
    k = F.col(key_col)
    b = F.broadcast(bits)
    p = probe.withColumn("__p1", _pos(k, "b1:", m_bits)).withColumn(
        "__p2", _pos(k, "b2:", m_bits)
    )
    p = p.join(
        b.withColumnRenamed("bit", "__p1"), "__p1", "leftsemi"
    ).join(b.withColumnRenamed("bit", "__p2"), "__p2", "leftsemi")
    return p.drop("__p1", "__p2")
