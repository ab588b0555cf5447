"""Custom stateful / recursive operators (grouped-map pandas UDF surface).

Operations whose recurrence can't be expressed as a SQL window frame —
the canonical example is EWMA (each output depends on the previous
OUTPUT, not a bounded frame of inputs). The batch form is
``applyInPandas`` per key; the streaming form is
``applyInPandasWithState`` (streaming/stateful.py) carrying the
accumulator across micro-batches.

Determinism contract: the recursion is written as explicit left-to-right
IEEE double arithmetic (``acc·(1−α) + x·α``) so a DuckDB
``list_reduce`` oracle computes bit-identical values — pandas'
``Series.ewm`` is NOT used (its internal formulation can differ in
rounding).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def ewma_per_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: tuple[str, ...],
    alpha: float = 0.5,
) -> DataFrame:
    """Final EWMA per key: y₀ = x₀; yₜ = yₜ₋₁·(1−α) + xₜ·α over the
    key's time-ordered values. Returns (key, n_events, ewma).

    Entirely JVM-side: collect the (order, value) structs per key,
    ``sort_array``, then fold with the ``aggregate`` higher-order
    function — no Python in the hot path (same recursion, ~6× faster
    than the grouped-map variant below)."""
    from pyspark.sql import functions as F

    order_struct = F.struct(*[F.col(c) for c in order_cols],
                            F.col(value_col).alias("__v"))
    grouped = df.groupBy(key_col).agg(
        F.sort_array(F.collect_list(order_struct)).alias("__seq")
    )
    vals = "transform(__seq, s -> s.__v)"
    fold = (
        f"aggregate(slice({vals}, 2, size(__seq) - 1), "
        f"element_at({vals}, 1), "
        f"(acc, x) -> acc * {1.0 - alpha}D + x * {alpha}D)"
    )
    return grouped.select(
        F.col(key_col),
        F.size("__seq").cast("long").alias("n_events"),
        F.expr(fold).alias("ewma"),
    )


def ewma_per_key_grouped_map(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: tuple[str, ...],
    alpha: float = 0.5,
) -> DataFrame:
    """Grouped-map pandas-UDF variant of ``ewma_per_key`` — same recursion
    in Python. Kept as the batch twin of the streaming accumulator
    (streaming/stateful.py) and as the template for recurrences that DO
    need Python (model-based smoothing etc.)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols))
        vals = pdf[value_col].to_list()
        acc = vals[0]
        for x in vals[1:]:
            acc = acc * (1.0 - alpha) + x * alpha
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(vals)],
                "ewma": [acc],
            }
        )

    return df.groupBy(key_col).applyInPandas(
        fold, f"{key_col} long, n_events long, ewma double"
    )
