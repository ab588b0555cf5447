"""Scaled interval (Winkler) score + empirical coverage — the
prediction-INTERVAL half of the M5 Uncertainty evaluation, companion
to the quantile pinball loss (``operators/pinball.py``).

For a central (1−α) interval [l, u] and outcome y, the Winkler score

    W = (u − l) + (2/α)·(l − y)₊ + (2/α)·(y − u)₊

rewards narrow intervals and charges 2/α per unit of miss. With α in
permille the α-multiplied score is exactly integral:

    w = α·(u − l) + 2000·(l − y)₊ + 2000·(y − u)₊       ( = α·W )

The forecaster evaluated is the standard empirical-train-quantile
interval: l = q(α/2), u = q(1 − α/2) as type-1 quantiles over the
train window (k = ceil(u·n/1000), the pinball.py convention), scored
on the last ``horizon`` periods and scaled by the naive one-step
absolute error, mirroring the competition's SPL scaling:

    sis_ppk = 1000 · Σw · n_diff DIV (α · n_eval · scale_num)

(1000× the classical scaled interval score; the α in the denominator
undoes the integral α-multiplication). Coverage is reported alongside
as cover_permille = 1000·n_in DIV n_eval — a calibrated (1−α)
interval should land near 1000−α.

Scale design mirrors pinball.py: the series aggregate is lazily
checkpointed once (four consuming branches, no ReusedExchange), the
per-key rank window runs over TRAIN rows only, the (tiny) alpha table
joins broadcast, and everything downstream is keyed on the series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scaled_interval_score(
    spark: SparkSession,
    series: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    horizon: int,
    alphas_permille: tuple[int, ...] = (500, 200, 50),
) -> DataFrame:
    """Score the empirical central-interval forecaster per (key, α).

    ``series``: one BIGINT ``value_col`` observation per (key,
    integer ``order_col``). The last ``horizon`` periods (relative to
    the GLOBAL max period) are the evaluation window; the rest train.

    Output per (key, alpha): n_train, n_eval, lo, hi, n_in,
    cover_permille, w_sum, scale_num, n_diff, sis_ppk (NULL when the
    train series is constant — scale undefined)."""
    if horizon < 1:
        raise ValueError("need horizon >= 1")
    for a in alphas_permille:
        if not 2 <= int(a) <= 998:
            raise ValueError("alphas are permille in [2, 998]")
    series = series.localCheckpoint(eager=False)
    split = series.agg(
        (F.max(order_col) - F.lit(int(horizon))).alias("__cut")
    )
    s = series.crossJoin(F.broadcast(split))
    train = s.filter(F.col(order_col) <= F.col("__cut"))
    ev = s.filter(F.col(order_col) > F.col("__cut"))

    w_rank = Window.partitionBy(key_col).orderBy(
        F.col(value_col), F.col(order_col)
    )
    w_lag = Window.partitionBy(key_col).orderBy(order_col)
    ranked = train.select(
        key_col,
        F.col(value_col).alias("__y"),
        F.row_number().over(w_rank).alias("__rn"),
    )
    tr_stats = train.select(
        key_col,
        F.col(value_col).alias("__y"),
        F.lag(value_col, 1).over(w_lag).alias("__prev"),
    ).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.abs(F.col("__y") - F.col("__prev")))
        .cast("long")
        .alias("scale_num"),
        F.count("__prev").alias("n_diff"),
    )
    alphas = F.broadcast(
        spark.createDataFrame(
            [(int(a),) for a in alphas_permille], "alpha bigint"
        ).coalesce(1)
    )
    # interval ends as type-1 empirical quantiles at α/2, 1 − α/2;
    # permille halving keeps k integral: lo_u = α DIV 2 (α even by
    # the classical levels; odd α just shifts the lower tail by half
    # a permille), hi_u = 1000 − lo_u.
    bounds = (
        tr_stats.crossJoin(alphas)
        .withColumn("__lo_u", F.expr("alpha DIV 2"))
        .withColumn("__hi_u", F.lit(1000) - F.col("__lo_u"))
        .withColumn("__k_lo", F.expr("(__lo_u * n_train + 999) DIV 1000"))
        .withColumn("__k_hi", F.expr("(__hi_u * n_train + 999) DIV 1000"))
    )
    lo = bounds.join(ranked, on=key_col).filter(
        F.col("__rn") == F.col("__k_lo")
    ).select(
        key_col, "alpha", "n_train", "scale_num", "n_diff",
        "__k_hi", F.col("__y").alias("lo"),
    )
    both = lo.join(ranked, on=key_col).filter(
        F.col("__rn") == F.col("__k_hi")
    ).select(
        key_col, "alpha", "n_train", "scale_num", "n_diff", "lo",
        F.col("__y").alias("hi"),
    )
    scored = (
        ev.select(key_col, F.col(value_col).alias("__y"))
        .join(both, on=key_col)
        .withColumn(
            "__w",
            F.col("alpha") * (F.col("hi") - F.col("lo"))
            + F.lit(2000)
            * F.greatest(F.col("lo") - F.col("__y"), F.lit(0))
            + F.lit(2000)
            * F.greatest(F.col("__y") - F.col("hi"), F.lit(0)),
        )
        .withColumn(
            "__in",
            (
                (F.col("__y") >= F.col("lo"))
                & (F.col("__y") <= F.col("hi"))
            ).cast("long"),
        )
        .groupBy(
            key_col, "alpha", "n_train", "scale_num", "n_diff",
            "lo", "hi",
        )
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum("__in").cast("long").alias("n_in"),
            F.sum("__w").cast("long").alias("w_sum"),
        )
    )
    return scored.select(
        key_col, "alpha", "n_train", "n_eval", "lo", "hi", "n_in",
        F.expr("1000 * n_in DIV n_eval").alias("cover_permille"),
        "w_sum", "scale_num", "n_diff",
        F.when(
            (F.col("scale_num") > 0) & (F.col("n_eval") > 0),
            F.expr(
                "1000 * w_sum * n_diff"
                " DIV (alpha * n_eval * scale_num)"
            ),
        ).alias("sis_ppk"),
    )
