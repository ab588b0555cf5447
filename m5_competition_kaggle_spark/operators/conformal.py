"""Split-conformal threshold — the finite-sample quantile rule.

Conformal prediction's calibration step: given n held-out
nonconformity scores, the prediction set that guarantees ≥ 1 - α
coverage for a NEW point uses the k-th smallest calibration score
with the finite-sample correction

    k = ceil((n + 1) * (1 - α))

— not the naive ceil(n·(1-α)); the +1 is what makes the marginal
coverage guarantee exact rather than asymptotic. With α the rational
alpha_num/alpha_den, k is pure integer arithmetic, the threshold is
an order statistic of the score column (exact), and the achieved
empirical coverage is published as an integer permille — so the
whole calibration certificate hash-checks.

Scale design: ranks are per-group partitioned windows (never
global); the coverage count is one broadcast join of the tiny
per-group threshold table back onto the scores plus a keyed agg.
k > n (too-small calibration sets for the requested α) surfaces as a
NULL threshold — "no finite guarantee", never a silent clamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def conformal_threshold(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    alpha_num: int,
    alpha_den: int,
) -> DataFrame:
    """Per-group conformal threshold at miscoverage α =
    alpha_num/alpha_den over BIGINT ``score_col``.

    Output per group: n, k (the corrected rank), q_hat (k-th
    smallest score; NULL when k > n), cov_count (calibration scores
    <= q_hat) and cov_permille = floor(1000·cov_count/n).
    """
    if not (0 < alpha_num < alpha_den):
        raise ValueError("need 0 < alpha_num < alpha_den")
    an, ad = int(alpha_num), int(alpha_den)
    w = Window.partitionBy(*group_cols).orderBy(score_col)
    ranked = df.select(*group_cols, score_col).withColumn(
        "__rn", F.row_number().over(w).cast("long")
    )
    # k = ceil((n+1) * (ad-an) / ad) via (x + ad - 1) DIV ad
    thresholds = (
        ranked.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "k",
            F.expr(f"((n + 1) * {ad - an} + {ad - 1}) DIV {ad}"),
        )
    )
    q_hat = (
        ranked.join(F.broadcast(thresholds), group_cols)
        .filter(F.col("__rn") == F.col("k"))
        .select(
            *group_cols, F.col(score_col).alias("q_hat")
        )
    )
    with_q = thresholds.join(F.broadcast(q_hat), group_cols, "left")
    cov = (
        df.select(*group_cols, score_col)
        .join(F.broadcast(with_q), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.when(
                    F.col(score_col) <= F.col("q_hat"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("cov_count")
        )
    )
    return (
        with_q.join(F.broadcast(cov), group_cols, "left")
        .withColumn(
            "cov_count",
            F.when(
                F.col("q_hat").isNotNull(), F.col("cov_count")
            ),
        )
        .withColumn(
            "cov_permille",
            F.when(
                F.col("q_hat").isNotNull(),
                F.expr("(1000 * cov_count) DIV n"),
            ),
        )
        .select(
            *group_cols, "n", "k", "q_hat",
            "cov_count", "cov_permille",
        )
    )
