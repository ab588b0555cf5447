"""Expected / maximum calibration error — the scalar monitors on top
of the x112 reliability table's binning convention.

ECE = (1/N)·Σ_b n_b·|acc_b − conf_b| with acc_b = n_pos_b/n_b and
conf_b = score_sum_b/(1000·n_b) on the integer-permille score scale.
The per-bin term telescopes to exact integers:

    n_b·|acc_b − conf_b| = |1000·n_pos_b − score_sum_b| / 1000

so abs_dev_sum = Σ_b |1000·n_pos_b − score_sum_b| is exact int64 and
ece_ppm = 1000·abs_dev_sum DIV N is 10⁶ × the classical ECE — no
per-bin truncation enters the certified scalar (unlike the
reliability table's display quotients). MCE is the worst single bin's
deviation in the same exact units, scaled per-bin.

Scale design: one keyed aggregate to the bin table (bounded by
1000/bin_width bins), one 1-row merge — the A3 global-scalar shape.
Overflow: score_sum_b ≤ 1000·n_b keeps every term under int64 until
N ~ 9·10¹⁵ rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expected_calibration_error(
    df: DataFrame,
    score_permille: Column,
    is_positive: Column,
    bin_width: int = 100,
) -> DataFrame:
    """One-row calibration summary.

    Output: n, n_bins, abs_dev_sum (Σ_b |1000·n_pos_b − score_sum_b|,
    exact), ece_ppm (= 1000·abs_dev_sum DIV n — 10⁶ × ECE),
    mce_permille (the worst bin's 1000·|…| DIV (1000·n_b) deviation),
    mce_bin (the bin holding it; smallest such bin on ties)."""
    if int(bin_width) < 1:
        raise ValueError(f"bin_width must be >= 1 (got {bin_width})")
    binned = df.select(
        score_permille.cast("long").alias("__score"),
        is_positive.cast("long").alias("__pos"),
    ).withColumn("__bin", F.expr(f"__score DIV {int(bin_width)}"))
    bins = binned.groupBy("__bin").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__pos").alias("__np"),
        F.sum("__score").alias("__ss"),
    ).withColumn(
        "__dev", F.abs(F.lit(1000) * F.col("__np") - F.col("__ss"))
    ).withColumn(
        # per-bin deviation in permille of probability:
        # |acc − conf|·1000 = dev DIV n_b
        "__dev_permille", F.expr("__dev DIV __n")
    )
    return bins.agg(
        F.sum("__n").cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("__dev").cast("long").alias("abs_dev_sum"),
        F.max(
            F.struct(
                F.col("__dev_permille").alias("d"),
                (-F.col("__bin")).alias("negbin"),
            )
        ).alias("__m"),
    ).select(
        "n",
        "n_bins",
        "abs_dev_sum",
        F.expr("1000 * abs_dev_sum DIV n").alias("ece_ppm"),
        F.col("__m.d").alias("mce_permille"),
        (-F.col("__m.negbin")).alias("mce_bin"),
    )
