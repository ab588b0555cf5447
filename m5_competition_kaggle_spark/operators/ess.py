"""Effective sample size of importance weights — exact integers.

The diagnostic that tells you whether a weighted estimate is real or
an illusion: importance/balancing weights (x27, x35) reduce the
information in n rows to

    ESS = (Σw)² / Σw²

equal-weight rows give ESS = n; one dominant weight collapses it
toward 1. A reweighted corpus whose ESS is 3% of n means the
"balanced" estimate really rests on a handful of documents — the
first number to check before trusting any weighted metric.

With integer (quantized) weights both sufficient sums are exact
int64, so the certificate publishes (Σw)² and Σw² exactly plus the
floor permille of ESS/n. One keyed partial-aggregating shuffle;
overflow contract: (Σw)² < 2^63 (Σw < 3.03e9 — quantize coarser for
heavier groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ess_by_group(
    df: DataFrame, group_cols: list[str], w_col: str
) -> DataFrame:
    """Per-group n, Σw, Σw², ess_num = (Σw)², ess_den = Σw², and
    ess_permille = floor(1000·ESS/n) for BIGINT weights ``w_col``."""
    w = F.col(w_col)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("sum_w"),
        F.sum(w * w).alias("sum_w2"),
    )
    return (
        agg.withColumn(
            "ess_num", F.col("sum_w") * F.col("sum_w")
        )
        .withColumn("ess_den", F.col("sum_w2"))
        .withColumn(
            "ess_permille",
            F.when(
                (F.col("sum_w2") > 0) & (F.col("n") > 0),
                F.expr("(1000 * ess_num) DIV (ess_den * n)"),
            ),
        )
    )
