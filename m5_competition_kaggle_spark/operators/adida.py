"""ADIDA — Aggregate-Disaggregate Intermittent Demand Approach
(Nikolopoulos et al., JORS 2011): the third classical intermittent-
demand forecaster beside Croston (x139) and the SBC selector (x141).
Where Croston smooths sizes and intervals separately, ADIDA removes
the intermittence itself: aggregate the daily series into
non-overlapping m-day buckets (m ≈ the mean inter-demand interval, so
most buckets are nonzero), run simple exponential smoothing on the
REGULAR bucket series, and disaggregate the level back to a per-day
rate.

Spark-first plan, all keyed:

1. one keyed shuffle: demand rows → (key, bucket = t DIV m) sums;
2. per-key bucket span via a window (min/max bucket), then an
   exploded ``sequence(min_b, max_b)`` grid LEFT-joined to the sums —
   zero buckets MUST participate in the SES (that regularized zero is
   the method's whole point); the grid is calendar-span/m bounded per
   key, never corpus-row bounded;
3. the integer SES fold of the croston/holt contract (unit-fraction
   α = 1/alpha_den, truncating DIV identical cross-engine) over the
   bucket-sorted array, JVM-side ``aggregate`` — no Python.

Output is exact int64 state; the DuckDB twin walks the same
recurrence with a recursive CTE over the same generated grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def adida_forecast(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    bucket_days: int = 7,
    alpha_den: int = 4,
) -> DataFrame:
    """Final ADIDA state per key over the integer-period demand series
    (``value_col`` at period ``order_col``; zero periods may be absent
    — they are reconstructed bucket-wise here).

    Output per key: n_buckets (full grid length), n_nonzero (buckets
    whose aggregated demand is nonzero — explicit q=0 input rows do
    not count), agg_level (SES level of the m-day totals), forecast_ppm =
    1_000_000 · agg_level DIV bucket_days — expected demand per
    period in ppm of a demand unit."""
    if bucket_days < 1 or alpha_den < 1:
        raise ValueError("need bucket_days >= 1 and alpha_den >= 1")
    m = int(bucket_days)
    ad = int(alpha_den)
    buckets = df.groupBy(
        F.col(key_col).alias("k"),
        F.expr(f"CAST({order_col} AS BIGINT) DIV {m}").alias("b"),
    ).agg(F.sum(F.col(value_col).cast("long")).alias("q"))
    # FLOOR bucketing for possibly-negative periods would need pmod;
    # demand periods are day indexes >= 0 by contract, so the cast
    # truncation IS floor here.
    w = Window.partitionBy("k")
    spanned = buckets.select(
        "k",
        "b",
        "q",
        F.min("b").over(w).alias("__b0"),
        F.max("b").over(w).alias("__b1"),
    )
    # n_nonzero = buckets whose aggregated demand is actually nonzero —
    # NOT merely buckets with input rows present (a caller supplying
    # explicit q=0 rows must not inflate it; ADVICE r9). Identical on
    # inputs where zero periods are absent rather than explicit.
    grid = (
        spanned.groupBy("k", "__b0", "__b1")
        .agg(
            F.sum(
                F.when(F.col("q") != 0, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("n_nonzero")
        )
        .select(
            "k",
            "n_nonzero",
            F.explode(F.expr("sequence(__b0, __b1)")).alias("b"),
        )
    )
    full = grid.join(
        buckets, on=["k", "b"], how="left"
    ).select(
        "k",
        "n_nonzero",
        "b",
        F.coalesce("q", F.lit(0)).cast("long").alias("q"),
    )
    seq = F.sort_array(
        F.collect_list(F.struct(F.col("b"), F.col("q")))
    )
    grouped = full.groupBy(F.col("k").alias(key_col)).agg(
        F.max("n_nonzero").alias("n_nonzero"),
        F.count(F.lit(1)).alias("n_buckets"),
        seq.alias("__seq"),
    )
    fold = (
        f"aggregate(slice(__seq, 2, size(__seq) - 1), "
        f"CAST(element_at(__seq, 1).q AS BIGINT), "
        f"(acc, x) -> acc + (x.q - acc) DIV {ad})"
    )
    state = grouped.withColumn("agg_level", F.expr(fold))
    return state.select(
        key_col,
        "n_buckets",
        "n_nonzero",
        "agg_level",
        F.expr(f"1000000 * agg_level DIV {m}").alias("forecast_ppm"),
    )
