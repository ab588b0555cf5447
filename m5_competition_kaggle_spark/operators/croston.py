"""Croston's method for intermittent demand — integer recurrence,
JVM-side fold.

The M5 corpus is dominated by intermittent series (most item-days sell
zero units); the reference's lag-feature LightGBM sidesteps that, but
the classical per-series baseline for such data is Croston (1972):
smooth the NONZERO demand sizes and the inter-demand intervals
separately, forecast their ratio. Zero periods never materialize —
they only enter through the interval ``t_k - t_{k-1}`` — so the
operator runs on the demand rows alone, never a calendar grid
(|keys| × |days| at 100 TB would dwarf the fact table).

Recurrence over the time-sorted nonzero demands (q_k at day t_k):

    z' = z + (q_k - z) DIV alpha_den       (size level, α = 1/ad)
    i  = t_k - t_{k-1}
    p' = p + (i - p) DIV alpha_den         (interval level)

with z initialized to q_1 and p initialized to the FIRST observed
interval (at k = 2; the sentinel p = -1 marks "no interval seen yet").
All-integer arithmetic: both engines' integer division truncates
toward zero identically, so the trajectory hash-certifies; smoothing
constants are unit fractions by design (the holt.py contract).

Scale design: one keyed aggregate collects each series to a sorted
array and folds it with the ``aggregate`` higher-order function —
entirely JVM-side, no Python. Keys are independent; array length is
the series' DEMAND count (sparse by definition for intermittent
series), not the calendar span. The DuckDB twin is a recursive CTE
walking the same recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def croston_forecast(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha_den: int = 4,
) -> DataFrame:
    """Final Croston state per key over the ``order_col``-sorted
    BIGINT nonzero-demand series (``value_col`` at integer period
    ``order_col``).

    Output per key: n_demands, size_level (z), interval_level (p; NULL
    for singleton series that never saw an interval) and forecast_ppm
    = 1_000_000 * z DIV p — expected demand per period in parts-per-
    million of a demand unit (NULL for singletons)."""
    if alpha_den < 1:
        raise ValueError("need alpha_den >= 1")
    ad = int(alpha_den)
    seq = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("__t"),
                F.col(value_col).alias("__v"),
            )
        )
    )
    grouped = df.groupBy(key_col).agg(
        seq.alias("__seq"), F.count(F.lit(1)).alias("n_demands")
    )
    # p = -1 is the "uninitialized" sentinel (real intervals are >= 1
    # under a per-(key, period) pre-aggregated input); after the first
    # interval lands, p stays >= 1: the update moves p at most
    # (p - 1) DIV ad toward a smaller interval, which cannot cross 1.
    fold = (
        f"aggregate(slice(__seq, 2, size(__seq) - 1), "
        f"named_struct("
        f"'z', CAST(element_at(__seq, 1).__v AS BIGINT), "
        f"'p', CAST(-1 AS BIGINT), "
        f"'pt', CAST(element_at(__seq, 1).__t AS BIGINT)), "
        f"(acc, x) -> named_struct("
        f"'z', acc.z + (x.__v - acc.z) DIV {ad}, "
        f"'p', CASE WHEN acc.p = -1 THEN x.__t - acc.pt "
        f"ELSE acc.p + ((x.__t - acc.pt) - acc.p) DIV {ad} END, "
        f"'pt', CAST(x.__t AS BIGINT)))"
    )
    state = grouped.withColumn("__st", F.expr(fold))
    return state.select(
        F.col(key_col),
        "n_demands",
        F.col("__st.z").alias("size_level"),
        F.when(F.col("__st.p") >= 1, F.col("__st.p")).alias(
            "interval_level"
        ),
        F.when(
            F.col("__st.p") >= 1,
            F.expr("1000000 * __st.z DIV __st.p"),
        ).alias("forecast_ppm"),
    )
