"""Leave-one-out target encoding — exact rational, leakage-free.

The standard high-cardinality categorical feature for gradient-boosted
models: replace a category with the mean target of the OTHER rows in
that category, so a row never sees its own label (the leakage the
naive group-mean encoding commits; see also the cluster-hash split's
leakage certificate, x98). With an integer-quantized target the LOO
mean is the exact rational

    loo = (S_g - y_i) / (n_g - 1)

published as the (numerator, denominator) pair plus its
truncating quotient (DIV — toward zero, identical in both engines), so the encoding hash-certifies row-for-row.

Scale design: one keyed aggregation reduces the corpus to one
(category, S, n) row per category, broadcast back onto the fact rows
— a map-side join, no second shuffle of the facts. Singleton
categories (n = 1) have no leave-one-out peers and surface with NULL
encoding rather than a silently-global fallback; callers choose the
prior themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def loo_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
) -> DataFrame:
    """Append exact LOO-encoding columns for BIGINT ``target_col``
    grouped by ``cat_col``.

    Output: all input columns plus cat_n (group size), loo_num
    (= S_g - y), loo_den (= n_g - 1) and loo_q (their truncating
    quotient); NULL loo_* on singleton categories.
    """
    stats = df.groupBy(cat_col).agg(
        F.sum(F.col(target_col)).cast("long").alias("__s"),
        F.count(F.lit(1)).alias("cat_n"),
    )
    num = F.col("__s") - F.col(target_col)
    den = F.col("cat_n") - F.lit(1)
    return (
        df.join(F.broadcast(stats), cat_col)
        .withColumn(
            "loo_num", F.when(den > 0, num).cast("long")
        )
        .withColumn(
            "loo_den", F.when(den > 0, den).cast("long")
        )
        .withColumn(
            "loo_q",
            F.when(den > 0, F.expr(
                f"(`__s` - `{target_col}`) DIV (cat_n - 1)"
            )),
        )
        .drop("__s")
    )
