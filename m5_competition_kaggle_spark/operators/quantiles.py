"""Deterministic quantiles: an exact distributed rank rule and a
mergeable histogram sketch with bounded error — the certified twin for
the quantile half of x17's Spark-internal ``approx_percentile``
(x45 already twins its HLL half).

Why not certify ``approx_percentile`` itself: its KLL-style compaction
is implementation-defined — no other engine reproduces its estimates.
Both operators here are pure integer arithmetic over micro-units
(``floor(value·1e6)``, the repo's portable quantization), so a SQL
engine replays them bit-for-bit (x52):

- **Exact**: the value at rank ``ceil(q·N/1000)`` = the smallest v
  whose cumulative count reaches the rank. The cumulative count runs
  through ``operators.prefix.global_running_sum`` — range-partitioned
  two-phase scan, NO single-partition window, so exact quantiles stay
  distributed at any scale.
- **Histogram sketch**: counts per fixed-width bin. State is bounded
  by the VALUE RANGE (range/width bins), not the row count; merge is
  binwise sum (same monoid argument as the CMS); the estimate (the
  matching bin's lower edge) is below the true quantile by less than
  one bin width — an a-priori error bound the x52 output exhibits via
  the exact values riding along.

Integer division truncates toward zero identically in Spark (``div``)
and DuckDB (``//``) — verified — so binning is portable as-is,
including for negative values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.prefix import global_running_sum

MICRO = 1_000_000
DEFAULT_BIN_UNITS = 100_000  # 0.1 in value terms


def _micro(value_col: str):
    return F.expr(
        f"cast(floor({value_col} * {MICRO}) as bigint)"
    )


def _rank_table(df_units: DataFrame, permilles: tuple[int, ...]):
    """(permille, r) with r = ceil(permille·N/1000) — N via a 1-row agg
    broadcast-cross-joined (constant-size, the A3 pattern)."""
    spark = df_units.sparkSession
    n = df_units.agg(F.count(F.lit(1)).alias("__n"))
    qs = spark.createDataFrame(
        [(p,) for p in permilles], "permille int"
    )
    return qs.crossJoin(F.broadcast(n)).select(
        "permille",
        F.expr("(permille * __n + 999) div 1000").cast("long").alias("__r"),
    )


def _value_at_ranks(keyed_counts: DataFrame, key: str, ranks) -> DataFrame:
    """min key whose running count ≥ r, per rank row — the cumulative
    count comes from the two-phase prefix scan (distributed)."""
    cum = global_running_sum(keyed_counts, "__c", (key,), "__cum")
    return (
        cum.join(
            F.broadcast(ranks), F.col("__cum") >= F.col("__r")
        )
        .groupBy("permille")
        .agg(F.min(key).alias(f"__min_{key}"))
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    permilles: tuple[int, ...] = (250, 500, 750, 900, 990),
) -> DataFrame:
    """(permille, exact_units): exact rank-based quantiles in
    micro-units, fully distributed."""
    units = df.select(_micro(value_col).alias("v"))
    counts = units.groupBy("v").agg(F.count(F.lit(1)).alias("__c"))
    ranks = _rank_table(units, permilles)
    return _value_at_ranks(counts, "v", ranks).select(
        "permille", F.col("__min_v").alias("exact_units")
    )


def hist_sketch(
    df: DataFrame,
    value_col: str,
    bin_units: int = DEFAULT_BIN_UNITS,
) -> DataFrame:
    """(bin, cnt): the mergeable histogram state — binwise-sum monoid,
    size bounded by value range / bin width regardless of row count."""
    units = df.select(_micro(value_col).alias("v"))
    return units.groupBy(
        F.expr(f"v div {bin_units}").alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    permilles: tuple[int, ...] = (250, 500, 750, 900, 990),
    bin_units: int = DEFAULT_BIN_UNITS,
) -> DataFrame:
    """(permille, est_units): sketch estimate = the lower edge of the
    bin where the rank lands — within one bin width below the truth."""
    units = df.select(_micro(value_col).alias("v"))
    bins = units.groupBy(
        F.expr(f"v div {bin_units}").alias("bin")
    ).agg(F.count(F.lit(1)).alias("__c"))
    ranks = _rank_table(units, permilles)
    return _value_at_ranks(bins, "bin", ranks).select(
        "permille",
        (F.col("__min_bin") * F.lit(bin_units)).alias("est_units"),
    )


def quantile_error_profile(
    df: DataFrame,
    value_col: str,
    permilles: tuple[int, ...] = (250, 500, 750, 900, 990),
    bin_units: int = DEFAULT_BIN_UNITS,
) -> DataFrame:
    """x52's exact-vs-sketch comparison in ONE pass: (permille,
    exact_units, est_units, err_units), row-identical to joining
    ``exact_quantiles`` with ``hist_quantiles``.

    The composed form scans the input four times (value counts, bin
    counts, and one count(*) per rank table) and runs TWO prefix scans.
    Here everything derives from a single per-value count table and its
    one cumulative scan (already frozen by ``global_running_sum``'s
    internal localCheckpoint):

    - N = max(__cum) — the scan's last value IS the row count;
    - exact_units: min v with __cum >= r, as before;
    - bin cumulative: since ``v div bin_units`` is monotone in v, the
      cumulative count at a bin's END equals max(__cum) within the bin
      — so the bin table folds out of the same scan instead of its own.

    Equivalence is property-tested against the composed operators in
    tests/test_quantiles.py.
    """
    spark = df.sparkSession
    units = df.select(_micro(value_col).alias("v"))
    counts = units.groupBy("v").agg(F.count(F.lit(1)).alias("__c"))
    cum = global_running_sum(counts, "__c", ("v",), "__cum")
    n = cum.agg(F.coalesce(F.max("__cum"), F.lit(0)).alias("__n"))
    qs = spark.createDataFrame([(p,) for p in permilles], "permille int")
    ranks = qs.crossJoin(F.broadcast(n)).select(
        "permille",
        F.expr("(permille * __n + 999) div 1000").cast("long").alias("__r"),
    )
    exact = (
        cum.join(F.broadcast(ranks), F.col("__cum") >= F.col("__r"))
        .groupBy("permille")
        .agg(F.min("v").alias("exact_units"))
    )
    bcum = cum.groupBy(F.expr(f"v div {bin_units}").alias("bin")).agg(
        F.max("__cum").alias("__bcum")
    )
    est = (
        bcum.join(F.broadcast(ranks), F.col("__bcum") >= F.col("__r"))
        .groupBy("permille")
        .agg((F.min("bin") * F.lit(bin_units)).alias("est_units"))
    )
    return (
        exact.join(est, "permille")
        .select(
            "permille",
            "exact_units",
            "est_units",
            (F.col("exact_units") - F.col("est_units")).alias("err_units"),
        )
    )
