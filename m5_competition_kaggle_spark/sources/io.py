"""Sources / sinks + Luigi-style resume (SURVEY §2 S1–S5, L3).

The reference exchanges every task boundary as a pickle file and uses file
existence as its memo key (reference ``common.py:48-65``; Luigi target
semantics). Here the exchange format is Parquet (splittable, columnar,
predicate-pushdown-able — pickle is none of those at 100 TB) and the memo
key is Spark's ``_SUCCESS`` marker.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """CSV scan (S1). Explicit schema when known — inference costs an extra
    full pass and yields unstable types at scale."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> None:
    """Parquet sink (S2). ``partition_by`` turns downstream equality filters
    on those columns into partition pruning (reference's manual per-store
    filter at ``pipeline.py:35`` becomes a pruned scan)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines sink (interchange with non-columnar consumers; prefer
    parquet for anything Spark reads back)."""
    df.write.mode("overwrite").json(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — columnar alternative when the downstream stack is
    Hive/ORC-native; same pushdown/pruning properties as parquet."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """CSV sink (S3, the submission writer at reference ``pipeline.py:379``).

    ``coalesce(1)`` only for genuinely small final outputs — a 100 TB sink
    must stay partitioned (``single_file=False``).
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def stage_done(path: str) -> bool:
    """Parquet-output existence check — the resume memo (L3)."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def run_stage(
    spark: SparkSession,
    path: str,
    build: Callable[[], DataFrame],
    partition_by: tuple[str, ...] = (),
    force: bool = False,
) -> DataFrame:
    """Luigi-style memoized stage: build + write unless output exists.

    Mirrors the reference's skip-if-output-exists semantics
    (``common.py:48-65``) without an orchestrator: each stage is an
    idempotent overwrite keyed on the ``_SUCCESS`` marker.
    """
    if force or not stage_done(path):
        write_parquet(build(), path, partition_by)
    return read_parquet(spark, path)


def drop_stage(path: str) -> None:
    """Artifact cleanup (S5; reference ``pipeline.py:298-304``)."""
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
