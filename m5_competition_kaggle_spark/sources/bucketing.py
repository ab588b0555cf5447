"""Storage-layout controls for shuffle-free joins and partition pruning.

The two physical-layout levers that matter most at 100 TB, exposed as
thin, testable helpers (reference has no storage layer beyond pickle
files — SURVEY §2 S2 — so this is engine extension surface):

- **Bucketed tables** (``write_bucketed`` / ``co_located_join``): both
  fact tables hash-bucketed on the join key with the same bucket count
  → Spark's bucketed scan feeds the sort-merge join directly and the
  per-query shuffle of BOTH sides disappears (plan-asserted in
  tests/test_storage_layout.py). This is how a nightly 100 TB
  fact-to-fact join amortizes its exchange: pay the partitioning once
  at write time, never per query.

- **Hive-style partitioned writes** (``write_partitioned``): directory
  partitioning on a low-cardinality column; equality/IN filters prune
  entire directories at planning time (``PartitionFilters`` in the scan,
  no I/O for dead partitions). The Spark-native form of the reference's
  hand-rolled per-store file splits (reference ``pipeline.py:35``).

Bucket-count guidance at scale: pick ``n_buckets`` so one bucket of the
LARGER table ≈ 128–512 MB (e.g. 100 TB fact → 2¹⁸ buckets); both sides
of a co-located join must agree exactly, so version the bucket count
with the table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table.

    ``sort_cols`` defaults to the bucket columns — pre-sorted buckets let
    the sort-merge join skip its per-query sort as well. ``path`` makes
    the table external (outside spark-warehouse), which tests use to
    write under a tmp dir.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on their join keys with equal bucket
    counts. With ``spark.sql.sources.bucketing.enabled`` (default true)
    the plan contains NO Exchange on either side — the bucketed scans
    are already hash-distributed the way the join needs."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style directory-partitioned parquet write. Filters on
    ``partition_cols`` become planning-time partition pruning for every
    reader of ``path``."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
