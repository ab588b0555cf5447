"""Inter-rater agreement (Cohen's kappa) — labeled-data QA.

When two annotators (or two labeling heuristics, or a model vs a gold
set) assign categories to the same items, raw percent agreement
overstates quality: two raters who both say "good" 90% of the time
agree 82% by pure chance. Cohen's kappa corrects for that chance
agreement — the standard acceptance gate for labeled training data.

Exactness: with n items, observed-agreement count ``a`` (diagonal sum)
and chance term ``e = sum_k row_k * col_k``, kappa = (n*a - e) /
(n*n - e). Numerator and denominator are pure int64 (magnitudes <=
n^2, safe below n ~ 3e9), so the whole contingency structure plus the
scaled kappa hash-certifies with zero float involvement; a permille
rendering uses the engines' shared truncate-toward-zero division.

Scale shape: one keyed aggregate to the contingency cells (bounded by
|A|*|B| categories), marginals as window sums OVER THE CELL TABLE
(never the raw rows), one 1-row global agg broadcast back. No window
touches the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kappa_contingency(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Contingency table of two raters with exact kappa terms.

    Output per (a, b) cell: ``a``, ``b``, ``c_ab`` (cell count),
    ``c_a`` / ``c_b`` (marginals), ``n``, ``kappa_num`` = n*diag - e,
    ``kappa_den`` = n*n - e and ``kappa_permille`` =
    (1000*kappa_num) DIV kappa_den (NULL when kappa_den = 0 — the
    degenerate single-category table where kappa is 0/0) — the same
    exact int64 triple on every row. NULL labels count as their own
    category (SQL GROUP BY semantics)."""
    cells = (
        df.groupBy(
            F.col(a_col).alias("a"), F.col(b_col).alias("b")
        ).agg(F.count(F.lit(1)).alias("c_ab"))
    )
    marg = (
        cells.withColumn(
            "c_a", F.sum("c_ab").over(Window.partitionBy("a"))
        )
        .withColumn("c_b", F.sum("c_ab").over(Window.partitionBy("b")))
    )
    totals = marg.agg(
        F.sum("c_ab").alias("n"),
        F.sum(
            F.when(F.col("a").eqNullSafe(F.col("b")), F.col("c_ab"))
            .otherwise(F.lit(0))
        ).alias("diag"),
        # e = sum_k row_k*col_k: each DIAGONAL-k cell row carries both
        # marginals of k; missing diagonal cells contribute 0 exactly
        # when either marginal is 0, and a category present in both
        # raters but never co-assigned still needs its product — so
        # compute e from the distinct category marginals instead.
    ).select("n", "diag")

    row_m = cells.groupBy("a").agg(F.sum("c_ab").alias("r"))
    col_m = cells.groupBy("b").agg(F.sum("c_ab").alias("c"))
    e_row = (
        row_m.join(col_m, row_m["a"].eqNullSafe(col_m["b"]), "inner")
        .agg(F.coalesce(F.sum(F.col("r") * F.col("c")), F.lit(0)).alias("e"))
    )
    scalars = (
        totals.crossJoin(F.broadcast(e_row))
        .withColumn("kappa_num", F.col("n") * F.col("diag") - F.col("e"))
        .withColumn("kappa_den", F.col("n") * F.col("n") - F.col("e"))
        .withColumn(
            "kappa_permille",
            # kappa_den = n² - e hits 0 when every row lands in ONE
            # category for both raters (e = n²): kappa is 0/0 there —
            # undefined, surfaced as NULL rather than the ANSI
            # DIVIDE_BY_ZERO crash a bare DIV would throw.
            F.when(
                F.col("kappa_den") != 0,
                F.expr("(1000 * kappa_num) DIV kappa_den"),
            ),
        )
        .select("n", "kappa_num", "kappa_den", "kappa_permille")
    )
    return marg.crossJoin(F.broadcast(scalars))
