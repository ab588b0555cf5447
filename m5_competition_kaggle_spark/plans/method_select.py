"""SBC-routed forecaster selection — the composition the classical
intermittent-demand stack exists for (reference parity note: the
reference trains ONE global LightGBM per store, ``pipeline.py:
258-266``; the classical alternative is per-series method selection,
and this plan certifies that whole loop, not just its parts):

1. split each series at ``cutoff = max(t) − horizon`` (train / eval);
2. classify every TRAIN series into its SBC quadrant
   (``operators/intermittency.sbc_classes`` — x141's machinery);
3. route: intermittent / lumpy → Croston (x139's operator, built for
   sparse demand), smooth / erratic → weekly-bucket ADIDA SES
   (x151's, built for regular series);
4. score the routed constant-rate forecast over the held-out horizon
   in exact µ-unit integers — Σ|10⁶·a_d − f_ppm| over eval periods
   WITH demand plus (horizon − n_eval)·f_ppm for the zero periods —
   against the always-zero baseline (10⁶·Σa_d), the degenerate
   forecaster sparse series make surprisingly hard to beat.

Every stage is an already-certified keyed operator; the composition
adds two keyed joins (classes ⨝ forecasts ⨝ eval stats) and one
broadcast of the per-family cutoff. Output is one row per series —
all exact int64, hash-certifiable end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.adida import adida_forecast
from m5_competition_kaggle_spark.operators.croston import (
    croston_forecast,
)
from m5_competition_kaggle_spark.operators.intermittency import (
    sbc_classes,
)

INTERMITTENT_CLASSES = ("intermittent", "lumpy")


def routed_forecast_eval(
    demand: DataFrame,
    key_col: str,
    t_col: str,
    q_col: str,
    horizon: int = 7,
    adida_bucket_days: int = 7,
    alpha_den: int = 4,
) -> DataFrame:
    """Route + forecast + evaluate one demand family (one BIGINT
    ``q_col`` per (key, integer period ``t_col``); zero periods
    absent). The split cutoff is the family's global max(t) −
    ``horizon``. Keys with < 2 TRAIN demands drop (SBC undefined).

    Output per key: sbc_class, method, f_ppm (routed per-period
    forecast, µ-units), n_eval (eval periods with demand), sae
    (µ-unit sum abs error over all ``horizon`` periods), sae_zero
    (the always-zero baseline's), beats_zero."""
    h = int(horizon)
    # r14: the demand table feeds SIX consumers (cutoff scalar, SBC
    # classes, both forecasters, eval stats, eval join); without a cut
    # each consumer re-runs the caller's base-table scan + keyed
    # aggregate. Materialize once — demand is bounded by keys×periods
    # (the family's own scale contract), so the checkpoint is the
    # dedup-family convention, not a corpus-sized cache.
    # r15 (VERDICT item 3): LAZY, not eager — the eager fill was a
    # serialization barrier ahead of six consumers that previously ran
    # as concurrent stages; the lazy form materializes inside the first
    # consumer action and still dedups the subtree. Five-variant A/B
    # (best-of-4 at 32c/4c): eager 3.33/3.53, eager+coalesce(1)
    # 2.97/3.99, LAZY 3.15/3.29, lazy+coalesce(1) 4.44/3.75, no
    # checkpoint 4.51/4.31 — lazy is the only variant ≤3.3 s at BOTH
    # core counts.
    demand = demand.localCheckpoint(eager=False)
    cut = demand.agg(
        (F.max(F.col(t_col)) - F.lit(h)).alias("__cutoff")
    )
    d = demand.join(F.broadcast(cut))
    train = d.filter(F.col(t_col) <= F.col("__cutoff")).select(
        F.col(key_col).alias("k"),
        F.col(t_col).alias("t"),
        F.col(q_col).cast("long").alias("q"),
    )
    ev = d.filter(F.col(t_col) > F.col("__cutoff")).select(
        F.col(key_col).alias("k"),
        F.col(q_col).cast("long").alias("q"),
    )
    classes = sbc_classes(train, "k", "t", "q").select(
        "k", "sbc_class"
    )
    cro = croston_forecast(
        train, "k", "t", "q", alpha_den=alpha_den
    ).select("k", F.col("forecast_ppm").alias("__f_cro"))
    ses = adida_forecast(
        train,
        "k",
        "t",
        "q",
        bucket_days=adida_bucket_days,
        alpha_den=alpha_den,
    ).select("k", F.col("forecast_ppm").alias("__f_ses"))
    routed = (
        classes.join(cro, "k", "left")
        .join(ses, "k", "left")
        .select(
            "k",
            "sbc_class",
            F.when(
                F.col("sbc_class").isin(*INTERMITTENT_CLASSES),
                F.lit("croston"),
            )
            .otherwise(F.lit("adida_ses"))
            .alias("method"),
            F.when(
                F.col("sbc_class").isin(*INTERMITTENT_CLASSES),
                F.col("__f_cro"),
            )
            .otherwise(F.col("__f_ses"))
            .alias("f_ppm"),
        )
    )
    ev_stats = ev.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum("q").alias("__q_eval"),
    )
    scored = routed.join(ev_stats, "k", "left").join(
        ev, "k", "left"
    )
    per_key = scored.groupBy(
        "k", "sbc_class", "method", "f_ppm"
    ).agg(
        F.coalesce(F.max("n_eval"), F.lit(0))
        .cast("long")
        .alias("n_eval"),
        F.sum(
            F.when(
                F.col("q").isNotNull(),
                F.abs(
                    F.lit(1_000_000) * F.col("q") - F.col("f_ppm")
                ),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("__sae_pos"),
        F.coalesce(F.max("__q_eval"), F.lit(0))
        .cast("long")
        .alias("__q_eval"),
    )
    return per_key.select(
        F.col("k").alias(key_col),
        "sbc_class",
        "method",
        "f_ppm",
        "n_eval",
        (
            F.col("__sae_pos")
            + (F.lit(h) - F.col("n_eval")) * F.col("f_ppm")
        ).alias("sae"),
        (F.lit(1_000_000) * F.col("__q_eval")).alias("sae_zero"),
        (
            F.col("__sae_pos")
            + (F.lit(h) - F.col("n_eval")) * F.col("f_ppm")
            < F.lit(1_000_000) * F.col("__q_eval")
        )
        .cast("int")
        .alias("beats_zero"),
    )
