"""Deterministic label encoding (SURVEY §2 F9, J4).

The reference dictionary-encodes string columns with pandas
``astype("category")`` (reference ``utils.py:42-47``), whose integer codes
are the **lexicographic rank of observed uniques**. That determinism matters
for LightGBM categorical-feature parity. ``StringIndexer``'s default
frequency ordering would NOT reproduce it; a dense_rank over the sorted
distinct values does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_encode(
    df: DataFrame,
    col: str,
    out_col: str | None = None,
    scalable: bool = False,
) -> DataFrame:
    """Attach ``out_col`` = 0-based lexicographic rank of ``col``'s value.

    Built as a broadcast join against the distinct-value code table rather
    than a global-window dense_rank over every row — the code table has one
    row per distinct value, so the expensive ranking happens on the small
    side and the fact table never re-shuffles.
    NULL encodes to -1 (pandas category code for NaN).

    ``scalable=False`` (default) ranks the distinct values with a global
    window — exact and fine up to ~millions of distinct values, but it is
    a single-partition sort. ``scalable=True`` ranks via the two-phase
    range-partitioned prefix scan (``operators.prefix.global_running_sum``
    of a constant 1: a value's 0-based rank is its exclusive running
    count) — fully distributed and DataFrame-native end to end (no RDD
    API, stays inside Catalyst/codegen), for high-cardinality columns
    (e.g. 3 M item ids); same codes, and the code table then joins (not
    broadcasts) if it outgrows the broadcast threshold.
    """
    from m5_competition_kaggle_spark.operators.prefix import (
        global_running_sum,
    )

    out = out_col or f"{col}_code"
    distinct = df.select(col).distinct().filter(F.col(col).isNotNull())
    if scalable:
        ranked = global_running_sum(
            distinct.withColumn("__one", F.lit(1)), "__one", (col,), "__rk"
        )
        codes = ranked.select(col, (F.col("__rk") - 1).alias(out))
        joined = df.join(codes, [col], "left")
    else:
        codes = distinct.withColumn(
            out, F.dense_rank().over(Window.orderBy(col)) - 1
        )
        joined = df.join(F.broadcast(codes), [col], "left")
    return joined.withColumn(out, F.coalesce(F.col(out), F.lit(-1)))
