"""k-anonymity / l-diversity profiling — the PII release gate.

A table is k-anonymous w.r.t. a set of quasi-identifier columns when
every equivalence class (distinct quasi-identifier combination) holds
at least k rows; it is l-diverse when every class also spans at least
l distinct values of the sensitive column. Training-data pipelines run
this BEFORE releasing user-derived tables (the structured-data twin of
x25's free-text PII redaction): classes below k must be suppressed or
generalized, and the profile quantifies exactly how much data that
costs.

Output is the class-SIZE histogram, not the classes themselves — the
report a release review needs, and deliberately free of the
quasi-identifier values so the profile itself is safe to share:
one row per observed class size with the number of classes, the rows
they hold, the worst (minimum) sensitive-value diversity among them,
and whether that size violates k.

Scale shape: one keyed aggregate over the quasi columns (count +
distinct-sensitive via a two-level groupBy, never count_distinct's
expand), then a tiny second aggregate over class sizes — output
cardinality is bounded by the number of DISTINCT class sizes, ~log n
in practice. No window over the full table, no driver math.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_profile(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int,
) -> DataFrame:
    """Class-size histogram of the quasi-identifier partition.

    Output per observed class size: ``class_size``, ``n_classes``,
    ``n_rows`` (= class_size * n_classes), ``min_ldiv`` (minimum
    distinct-``sensitive_col`` count among classes of that size) and
    ``violates_k`` (1 when class_size < k). Rows where any quasi
    column is NULL form their own classes (groupBy NULL semantics),
    matching SQL ``GROUP BY``.
    """
    if int(k) < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    quasi = [F.col(c) for c in quasi_cols]
    # distinct sensitive per class WITHOUT count_distinct's expand:
    # first collapse to (quasi, sensitive) pairs, then count pairs.
    pairs = (
        df.groupBy(*quasi, F.col(sensitive_col).alias("__sens"))
        .agg(F.count(F.lit(1)).alias("__pair_rows"))
    )
    classes = pairs.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.sum("__pair_rows").alias("class_size"),
        F.count(F.lit(1)).alias("ldiv"),
    )
    return (
        classes.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
            F.min("ldiv").alias("min_ldiv"),
        )
        .withColumn(
            "violates_k",
            (F.col("class_size") < F.lit(int(k))).cast("int"),
        )
    )
