"""Holt linear-trend smoothing — integer recurrence, JVM-side fold.

The next step up from EWMA (s5): double exponential smoothing tracks
a level AND a trend, so the one-step-ahead forecast l + b follows a
drifting series instead of lagging it. The recurrence

    e  = y_t - (l + b)                    (one-step surprise)
    l' = l + b + e DIV alpha_den          (level update, α = 1/ad)
    b' = b + e DIV beta_den               (trend update, αβ = 1/bd)

runs in INTEGER arithmetic — both engines' integer division truncates
toward zero identically, so the whole trajectory is deterministic and
the final state hash-certifies. Smoothing constants are unit
fractions by design; that is the price of exactness.

Scale design: the per-key series collects to one sorted array and
folds with the ``aggregate`` higher-order function — entirely
JVM-side, no Python (the s5 pattern, ~6× the grouped-map variant).
Keys are independent; series length is bounded by the time window,
not the corpus. The DuckDB twin is a recursive CTE walking the same
recurrence (v1.0's ``list_reduce`` cannot carry a two-field
accumulator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_level_trend(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha_den: int = 4,
    beta_den: int = 8,
) -> DataFrame:
    """Final Holt (level, trend) per key over the ``order_col``-sorted
    BIGINT ``value_col`` series; initial state l = y_1, b = 0.

    Output per key: n_points, level, trend and forecast_next =
    level + trend. Singleton series forecast their only value."""
    if alpha_den < 1 or beta_den < 1:
        raise ValueError("need alpha_den >= 1 and beta_den >= 1")
    seq = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("__t"),
                F.col(value_col).alias("__v"),
            )
        )
    )
    grouped = df.groupBy(key_col).agg(seq.alias("__seq"))
    vals = "transform(__seq, s -> s.__v)"
    fold = (
        f"aggregate(slice({vals}, 2, size(__seq) - 1), "
        f"named_struct('l', CAST(element_at({vals}, 1) AS BIGINT), "
        f"'b', CAST(0 AS BIGINT)), "
        f"(acc, x) -> named_struct("
        f"'l', acc.l + acc.b + (x - acc.l - acc.b) DIV {alpha_den}, "
        f"'b', acc.b + (x - acc.l - acc.b) DIV {beta_den}))"
    )
    # evaluate the O(n) fold ONCE into a struct column, then project
    # — two separate (fold).l / (fold).b expressions would run the
    # whole fold twice per key (ArrayAggregate is codegen-fallback,
    # so CSE is not guaranteed to merge them)
    return (
        grouped.select(
            F.col(key_col),
            F.size("__seq").cast("long").alias("n_points"),
            F.expr(fold).alias("__st"),
        )
        .select(
            key_col,
            "n_points",
            F.col("__st.l").alias("level"),
            F.col("__st.b").alias("trend"),
        )
        .withColumn(
            "forecast_next", F.col("level") + F.col("trend")
        )
    )
