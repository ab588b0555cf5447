"""Information-theoretic column diagnostics.

Mutual information between two low-cardinality columns is the
feature-selection / leakage-screening primitive a training-data
pipeline runs before committing to a feature: MI(X;Y) = 0 means the
candidate column carries nothing about the target; MI near H(Y) means
it IS the target (leakage). Complements the distribution-shape
diagnostics (x80 Gini, x103 DQ report) with a DEPENDENCE measure.

Scale shape: one keyed aggregate builds the (x, y) contingency cells —
output bounded by |X|·|Y|, never by the row count — then the marginals
ride two windows PARTITIONED BY x and y over that bounded cell table
(keyed, partial-aggregatable), and the grand total is the established
1-row-aggregate + broadcast pattern (A3), so no single-partition
exchange touches anything row-count-sized.

Determinism: counts are exact int64; the per-cell PMI contribution is
an IEEE double from the same literal expression tree in Spark and the
SQL oracle (ln of integer ratios), certified under the harness's
6-significant-digit rounding — the x32/x63 precedent (x107).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mutual_information_cells(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Contingency cells with marginals and per-cell weighted PMI.

    Output per observed (x, y): c_xy, c_x, c_y, n, and
    mi_term = (c_xy/n) * ln(n*c_xy / (c_x*c_y)) — summing mi_term over
    all cells gives MI(X;Y) in nats. NULLs in either column are
    excluded (a NULL category is a data-quality question, x103's job).
    """
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(
            F.col(x_col).alias("x"), F.col(y_col).alias("y")
        )
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    cells = cells.withColumn(
        "c_x", F.sum("c_xy").over(Window.partitionBy("x"))
    ).withColumn(
        "c_y", F.sum("c_xy").over(Window.partitionBy("y"))
    )
    total = cells.agg(F.sum("c_xy").alias("n"))
    return (
        cells.crossJoin(F.broadcast(total))
        .withColumn(
            "mi_term",
            (F.col("c_xy").cast("double") / F.col("n"))
            * F.log(
                F.col("n").cast("double") * F.col("c_xy")
                / (F.col("c_x").cast("double") * F.col("c_y"))
            ),
        )
    )
