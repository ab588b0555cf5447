"""Forecastability features per series — the method-selection
front-end beside SBC's demand quadrants (x141): WHICH structure does
a series carry, before any forecaster runs?

Three features per key, from ONE keyed pass over the series:

- vmr_permille: variance-to-mean ratio (index of dispersion) —
  Poisson ≈ 1000, overdispersed ≫ 1000. All-integer:
  1000·(n·Q − S²) DIV (n·S) from the (n, S = Σy, Q = Σy²)
  sufficient statistics.
- eta2_dow_ppm: day-of-week seasonal strength as the one-way
  eta-squared SS_between/SS_total over the seven dow groups. The
  per-dow sufficient stats PIVOT to a fixed 7-column shape first, so
  the double-precision combination is a FIXED expression tree —
  never a row-order-dependent double sum (the Spark aggregation-
  order nondeterminism trap); identical integer inputs give
  bit-identical IEEE results in both engines.
- trend_slope_ppm: OLS slope of y on t in ppm —
  1_000_000·(n·Σty − Σt·Σy) DIV (n·Σt² − (Σt)²), exact integers.

Scale: one keyed aggregate to (key, dow) cells (≤7 per key), one
pivot to a single row per key, one expression — shuffle volume is
7·|keys| regardless of corpus rows. Overflow contract: Σty needs
t·y·span < 9.2·10^18 — day-indexed series with permille values hold
to ~10^9 rows/key; rescale beyond."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def forecastability_features(
    series: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key forecastability triple over the integer (time, value)
    series. Output: key, n, vmr_permille (NULL when the mean is 0),
    eta2_dow_ppm (NULL when the series is constant), trend_slope_ppm
    (NULL for a single point)."""
    cells = series.groupBy(
        key_col,
        F.expr(f"CAST({time_col} AS BIGINT) % 7").alias("__dow"),
    ).agg(
        F.count(F.lit(1)).alias("n_d"),
        F.sum(F.col(value_col).cast("long")).alias("s_d"),
        F.sum(
            F.col(value_col).cast("long")
            * F.col(value_col).cast("long")
        ).alias("q_d"),
        F.sum(F.expr(f"CAST({time_col} AS BIGINT)")).alias("st_d"),
        F.sum(
            F.expr(
                f"CAST({time_col} AS BIGINT) * "
                f"CAST({time_col} AS BIGINT)"
            )
        ).alias("stt_d"),
        F.sum(
            F.expr(f"CAST({time_col} AS BIGINT)")
            * F.col(value_col).cast("long")
        ).alias("sty_d"),
    )
    # fixed 7-column pivot: the doubles below combine a FIXED shape,
    # never an order-dependent double sum across rows
    agg_cols = []
    for d in range(7):
        for c in ("n_d", "s_d"):
            agg_cols.append(
                F.sum(
                    F.when(F.col("__dow") == d, F.col(c)).otherwise(
                        F.lit(0)
                    )
                ).alias(f"{c}{d}")
            )
    agg_cols += [
        F.sum("n_d").alias("n"),
        F.sum("s_d").alias("S"),
        F.sum("q_d").alias("Q"),
        F.sum("st_d").alias("St"),
        F.sum("stt_d").alias("Stt"),
        F.sum("sty_d").alias("Sty"),
    ]
    row = cells.groupBy(key_col).agg(*agg_cols)
    ss_between = " + ".join(
        f"CASE WHEN n_d{d} > 0 THEN "
        f"CAST(s_d{d} AS DOUBLE) * CAST(s_d{d} AS DOUBLE) "
        f"/ CAST(n_d{d} AS DOUBLE) ELSE 0.0 END"
        for d in range(7)
    )
    return row.select(
        key_col,
        "n",
        F.when(
            F.col("S") > 0,
            F.expr("1000 * (n * Q - S * S) DIV (n * S)"),
        ).alias("vmr_permille"),
        # Gate on BOTH forms of the denominator: the exact integer
        # n*Q - S*S > 0 AND the double it is computed with — for huge
        # magnitudes the double subtraction can round to 0.0 while the
        # integer stays positive, and floor(Inf) diverges across
        # engines (Spark saturates, DuckDB raises). ADVICE r9.
        F.when(
            (F.expr("n * Q - S * S") > 0)
            & (
                F.expr(
                    "CAST(Q AS DOUBLE) - CAST(S AS DOUBLE) * "
                    "CAST(S AS DOUBLE) / CAST(n AS DOUBLE)"
                )
                > F.lit(0.0)
            ),
            F.floor(
                F.lit(1_000_000.0)
                * (
                    F.expr(ss_between)
                    - F.expr(
                        "CAST(S AS DOUBLE) * CAST(S AS DOUBLE)"
                        " / CAST(n AS DOUBLE)"
                    )
                )
                / F.expr(
                    "CAST(Q AS DOUBLE) - CAST(S AS DOUBLE) * "
                    "CAST(S AS DOUBLE) / CAST(n AS DOUBLE)"
                )
            ).cast("long"),
        ).alias("eta2_dow_ppm"),
        F.when(
            F.expr("n * Stt - St * St") > 0,
            F.expr(
                "1000000 * (n * Sty - St * S) "
                "DIV (n * Stt - St * St)"
            ),
        ).alias("trend_slope_ppm"),
    )
