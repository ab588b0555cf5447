"""Split-balance certificate — per-stratum χ² of a train/test split.

The companion of the hash split (x18) and the leakage certificate
(x98): a split can be leakage-free and still BIASED — if one language
or source lands disproportionately in test, every per-stratum metric
is skewed. This measures it: per stratum, the observed train/test
counts vs the expectation under independence, the integer permille
train share vs the global share, and the stratum's χ² contribution

    χ²_s = Σ_{c in train,test} (O_sc - R_s·C_c/N)² / (R_s·C_c/N)

as a fixed-shape double expression tree over exact int64 counts (the
x107/x114 shared-expression precedent) — the integers certify the
data, the double certifies the arithmetic.

Scale design: one keyed (stratum) partial-aggregating shuffle; the
1-row global margin joins back by broadcast. No windows, no second
pass over the rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chi2_cell(o: Column, r: Column, c: Column, n: Column) -> Column:
    e = r.cast("double") * c.cast("double") / n.cast("double")
    d = o.cast("double") - e
    return d * d / e


def split_balance(
    df: DataFrame, strata_cols: list[str], train_flag: Column
) -> DataFrame:
    """Per-stratum balance of the boolean ``train_flag`` split.

    Output per stratum: n_train, n_test, n_row, train_permille,
    global_train_permille (identical every row — the comparison
    anchor), and chi2 (the stratum's additive χ² contribution; NULL
    when a margin is empty). A NULL ``train_flag`` row belongs to
    NEITHER side — it is excluded from both counts rather than
    silently defaulting into test (the three-valued-boolean trap of
    a bare ``otherwise``)."""
    cells = df.groupBy(*strata_cols).agg(
        F.sum(F.when(train_flag, 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(~train_flag, 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )
    margins = cells.agg(
        F.sum("n_train").alias("__t_train"),
        F.sum("n_test").alias("__t_test"),
    )
    out = (
        cells.crossJoin(F.broadcast(margins))
        .withColumn("n_row", F.col("n_train") + F.col("n_test"))
        .withColumn("__n", F.col("__t_train") + F.col("__t_test"))
        .withColumn(
            "train_permille",
            F.expr("(1000 * n_train) DIV n_row"),
        )
        .withColumn(
            "global_train_permille",
            F.expr("(1000 * __t_train) DIV __n"),
        )
        .withColumn(
            "chi2",
            F.when(
                (F.col("__t_train") > 0)
                & (F.col("__t_test") > 0)
                & (F.col("n_row") > 0),
                _chi2_cell(
                    F.col("n_train"), F.col("n_row"),
                    F.col("__t_train"), F.col("__n"),
                )
                + _chi2_cell(
                    F.col("n_test"), F.col("n_row"),
                    F.col("__t_test"), F.col("__n"),
                ),
            ),
        )
        .select(
            *strata_cols, "n_train", "n_test", "n_row",
            "train_permille", "global_train_permille", "chi2",
        )
    )
    return out
