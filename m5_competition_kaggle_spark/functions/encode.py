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


def label_encode(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """Attach ``out_col`` = 0-based lexicographic rank of ``col``'s value.

    Built as a broadcast join against the (small) distinct-value code table
    rather than a global-window dense_rank over every row — the code table
    has one row per distinct value, so the expensive global sort happens on
    the tiny side and the fact table never re-shuffles.
    NULL encodes to -1 (pandas category code for NaN).
    """
    out = out_col or f"{col}_code"
    codes = (
        df.select(col).distinct()
        .filter(F.col(col).isNotNull())
        .withColumn(out, F.dense_rank().over(Window.orderBy(col)) - 1)
    )
    joined = df.join(F.broadcast(codes), [col], "left")
    return joined.withColumn(out, F.coalesce(F.col(out), F.lit(-1)))
