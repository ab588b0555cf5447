"""Theil–Sen robust trend per series — the median of all pairwise
slopes. The OLS slope (x73's regression, x152's trend feature) is
breakdown-point-zero: one corrupted day drags it arbitrarily. The
Theil–Sen estimator tolerates ~29% contamination, which is what a
data-quality trend monitor needs when the series ITSELF comes from a
pipeline being monitored for corruption.

Plan: the series is first reduced to one row per (key, time) — daily
granularity bounds it by the calendar, never corpus rows — then a
keyed self-join builds the i<j pair set (≤ span²/2 pairs per key,
calendar-bounded), each pair carrying its EXACT rational slope
(dy = y_j − y_i, dx = t_j − t_i > 0). The median pick orders pairs by
the double quotient dy/dx (identical (int64, int64) inputs quotient
bit-identically in Spark and DuckDB) with a deterministic (t_i, t_j)
tie-break, and selects rank ceil(n_pairs/2) — the lower median, an
ACTUAL pair, so the certified outputs are its exact integers
(slope_num, slope_den) plus the truncating-quotient slope_ppm.

Overflow contract: |dy| · 10⁶ must stay inside int64 — daily values
to ~9·10¹² hold; rescale beyond. At 100 TB the pair blowup is the
knob to watch: span² pairs per key is fine for daily calendars
(~3 years → ~600k pairs), wrong for raw event times — aggregate to a
bounded grid first, exactly as this module's queries do."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def theil_sen_slope(
    series: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key Theil–Sen slope over the integer (time, value) series
    (one row per (key, time) — pre-aggregate duplicates upstream).

    Output per key: n (points), n_pairs, slope_num/slope_den (the
    exact rational of the lower-median pair), slope_ppm =
    1_000_000·slope_num DIV slope_den. Keys with n < 2 drop."""
    pts = series.select(
        F.col(key_col).alias("k"),
        F.col(time_col).cast("long").alias("t"),
        F.col(value_col).cast("long").alias("y"),
    )
    a = pts.select("k", F.col("t").alias("ti"), F.col("y").alias("yi"))
    b = pts.select("k", F.col("t").alias("tj"), F.col("y").alias("yj"))
    pairs = (
        a.join(b, on="k", how="inner")
        .filter(F.col("ti") < F.col("tj"))
        .select(
            "k",
            "ti",
            "tj",
            (F.col("yj") - F.col("yi")).alias("dy"),
            (F.col("tj") - F.col("ti")).alias("dx"),
        )
    )
    w_all = Window.partitionBy("k")
    w_rank = Window.partitionBy("k").orderBy(
        (F.col("dy").cast("double") / F.col("dx").cast("double")).asc(),
        F.col("ti").asc(),
        F.col("tj").asc(),
    )
    ranked = pairs.select(
        "k",
        "dy",
        "dx",
        F.row_number().over(w_rank).alias("__r"),
        F.count(F.lit(1)).over(w_all).alias("n_pairs"),
    ).filter(F.expr("__r = (n_pairs + 1) DIV 2"))
    n_pts = pts.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    return (
        n_pts.join(ranked, on="k", how="inner")
        .select(
            F.col("k").alias(key_col),
            "n",
            "n_pairs",
            F.col("dy").alias("slope_num"),
            F.col("dx").alias("slope_den"),
            F.expr("1000000 * dy DIV dx").alias("slope_ppm"),
        )
    )
