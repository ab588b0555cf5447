"""Isotonic calibration (pool-adjacent-violators) over bounded score
bins — the CALIBRATOR the reliability table (x112) and ECE/MCE (x145)
only measure. Reference parity: the reference's model-quality stage
consumes raw scores (pipeline.py:258-266 trains on them directly);
a production scoring pipeline needs the monotone recalibration map
itself, which no existing operator produced.

Spark-first design: the classical PAV stack is inherently sequential,
but its SOLUTION has a closed minimax form —

    fitted[i] = max_{j<=i} min_{k>=i} avg(y over bins j..k)

— which is fully relational once the score domain is BOUNDED BY
CONSTRUCTION (the caller maps raw scores to <= B bins, exactly like
the reliability/ECE operators). The plan is then:

1. one keyed shuffle: groupBy(group, bin) -> (n, n_pos) cells,
2. one keyed window: cumulative (N_i, P_i) prefix sums per group,
3. a bounded self-join on the group key (j <= k pairs, <= B(B+1)/2
   rows per group) computing the segment rate (P_k - P_{j-1}) /
   (N_k - N_{j-1}),
4. a REVERSED-sort growing-frame window per (group, j) for the
   min-over-suffix (never an unbounded-FOLLOWING frame), and
5. one keyed aggregate max over j <= i.

Shuffle volume after step 1 is B-bounded per group — independent of
corpus row count, so the 100 TB cost is the single cell aggregation.
Segment rates are compared as doubles (identical (int, int) inputs
give bit-identical IEEE quotients in Spark and DuckDB); emitted
fitted values are floored to permille, so equal-rational ties cannot
diverge across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def isotonic_fit(
    df: DataFrame,
    group_cols: list[str],
    bin_col: Column | str,
    label_col: Column | str,
) -> DataFrame:
    """Monotone (non-decreasing) calibration map per group: for each
    score bin, the PAV-fitted positive rate in permille alongside the
    raw rate. ``bin_col`` must have a bounded domain (<= a few hundred
    distinct values) — quantize upstream, exactly as the reliability
    binning does; ``label_col`` is a boolean/0-1 expression.

    Output: group cols + bin, n_b, n_pos, raw_permille,
    fitted_permille — fitted is non-decreasing in bin within each
    group (the isotonic invariant, pinned by tests)."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    cells = df.groupBy(*group_cols, b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum(y.cast("long")).alias("n_pos"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.select(
        *group_cols,
        "bin",
        "n_b",
        "n_pos",
        F.sum("n_b").over(w).alias("N"),
        F.sum("n_pos").over(w).alias("P"),
    )
    lo = cum.select(
        *group_cols,
        F.col("bin").alias("j_bin"),
        (F.col("N") - F.col("n_b")).alias("N_prev"),
        (F.col("P") - F.col("n_pos")).alias("P_prev"),
    )
    hi = cum.select(
        *group_cols,
        F.col("bin").alias("k_bin"),
        F.col("N").alias("N_k"),
        F.col("P").alias("P_k"),
    )
    # bounded j <= k pair table per group (<= B(B+1)/2 rows)
    pairs = lo.join(hi, on=group_cols, how="inner").filter(
        F.col("j_bin") <= F.col("k_bin")
    )
    rate = pairs.select(
        *group_cols,
        "j_bin",
        "k_bin",
        (
            (F.col("P_k") - F.col("P_prev")).cast("double")
            / (F.col("N_k") - F.col("N_prev")).cast("double")
        ).alias("seg_rate"),
    )
    # min over suffixes k >= i, materialized at every i = k: reversed
    # sort + growing frame (an unbounded-FOLLOWING frame is O(n^2)
    # per partition in WindowExec)
    w_suffix = (
        Window.partitionBy(*group_cols, "j_bin")
        .orderBy(F.col("k_bin").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = rate.select(
        *group_cols,
        "j_bin",
        F.col("k_bin").alias("i_bin"),
        F.min("seg_rate").over(w_suffix).alias("min_rate"),
    )
    # fitted[i] = max over j <= i; every m-row at i already has
    # j_bin <= i_bin, so this is a plain keyed aggregate
    fitted = m.groupBy(*group_cols, "i_bin").agg(
        F.max("min_rate").alias("fitted_rate")
    )
    fitted = fitted.withColumnRenamed("i_bin", "bin")
    out = cells.join(fitted, on=[*group_cols, "bin"], how="inner")
    return out.select(
        *group_cols,
        "bin",
        "n_b",
        "n_pos",
        F.expr("1000 * n_pos DIV n_b").alias("raw_permille"),
        F.floor(F.lit(1000.0) * F.col("fitted_rate"))
        .cast("long")
        .alias("fitted_permille"),
    )
