"""Scaled pinball loss — the M5 Uncertainty companion metric to RMSSE.

The reference repo scores the M5 Accuracy track (point forecasts,
RMSSE — see ``operators/rmsse.py``); the sibling Uncertainty track
scores QUANTILE forecasts with the scaled pinball loss (SPL). This
module closes that half of the competition's evaluation loop: per
(series, quantile level u) it scores the empirical-train-quantile
forecaster — the standard non-parametric benchmark — on a held-out
horizon, scaled by the training naive one-step absolute error exactly
as the competition defines.

Everything is integer arithmetic, so the certificate hashes:

- forecast f(u) = the k-th smallest train value with
  k = ceil(u·n/1000) = (u·n + 999) DIV 1000 (type-1 empirical
  quantile, ties broken by the period index);
- pinball at permille level u: P = u·(y−f) if y ≥ f else
  (1000−u)·(f−y)  (i.e. 1000× the classical loss);
- scale: D = Σ|y_t − y_{t−1}| over train, N = (#train − 1) diffs;
- spl_ppm = 1000 · ΣP · N DIV (n_eval · D) — 1e6 × the competition's
  SPL ratio. Fits int64 through ~sf10 on the quantized series
  (ΣP ≤ 1000·|y|·h; the 1000·ΣP·N product stays < 2^63 while
  |y| < ~4e12).

Scale design: the rank is one per-key window over TRAIN rows only,
the (tiny) level table joins broadcast, and every aggregate is keyed
on the series — nothing global but the 1-row max-period scalar that
defines the split (the A3 broadcast-scalar shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scaled_pinball_loss(
    spark: SparkSession,
    series: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    horizon: int,
    levels_permille: tuple[int, ...] = (500, 750, 900, 975),
) -> DataFrame:
    """Score the empirical-quantile forecaster per (key, level).

    ``series``: one BIGINT ``value_col`` observation per (key,
    integer ``order_col``). The last ``horizon`` periods (relative to
    the GLOBAL max period) are the evaluation window; the rest train.

    Output per (key, u): n_train, n_eval, fcst, pin_sum, scale_num,
    n_diff, spl_ppm (NULL when the train series is constant —
    scale_num = 0). Keys with no eval-window or no train rows drop
    (nothing to score / nothing to forecast from)."""
    if horizon < 1:
        raise ValueError("need horizon >= 1")
    for u in levels_permille:
        if not 1 <= int(u) <= 999:
            raise ValueError("levels are permille in [1, 999]")
    # The series aggregate feeds FOUR branches (the split scalar, the
    # rank window, the scale stats and the eval join) and Catalyst
    # plants no ReusedExchange across them — without truncation the
    # corpus-sized source would be re-scanned per branch. The series
    # itself is calendar × key bounded, so one lazy localCheckpoint
    # (the x58/x130 lesson) caps the cost at a single scan.
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
    levels = F.broadcast(
        spark.createDataFrame(
            [(int(u),) for u in levels_permille], "u bigint"
        ).coalesce(1)
    )
    # k = ceil(u*n/1000); pick the k-th smallest train value per key
    fcst = (
        tr_stats.crossJoin(levels)
        .withColumn("__k", F.expr("(u * n_train + 999) DIV 1000"))
        .join(ranked, on=key_col)
        .filter(F.col("__rn") == F.col("__k"))
        .select(
            key_col, "u", "n_train", "scale_num", "n_diff",
            F.col("__y").alias("fcst"),
        )
    )
    pin = (
        ev.select(key_col, F.col(value_col).alias("__y"))
        .join(fcst, on=key_col)
        .withColumn(
            "__p",
            F.when(
                F.col("__y") >= F.col("fcst"),
                F.col("u") * (F.col("__y") - F.col("fcst")),
            ).otherwise(
                (F.lit(1000) - F.col("u"))
                * (F.col("fcst") - F.col("__y"))
            ),
        )
        .groupBy(
            key_col, "u", "n_train", "scale_num", "n_diff", "fcst"
        )
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum("__p").cast("long").alias("pin_sum"),
        )
    )
    return pin.select(
        key_col, "u", "n_train", "n_eval", "fcst", "pin_sum",
        "scale_num", "n_diff",
        F.when(
            (F.col("scale_num") > 0) & (F.col("n_eval") > 0),
            F.expr(
                "1000 * pin_sum * n_diff DIV (n_eval * scale_num)"
            ),
        ).alias("spl_ppm"),
    )
