"""Integer-exact training step for the quality classifier — the last
rows-only residue of x28 made hash-certifiable (r4 verdict item 8).

x28's certification was split over three certified surfaces: features
(x36 ``hashed_tf_pairs``), scoring (x44 ``fixed_weight_logits``), and —
until now — nothing for the TRAINING arithmetic itself, because L-BFGS
over float sigmoids can't be replayed bit-for-bit by another engine.
This module certifies one full training iteration instead, with the
same integer-exactness trick as x44: a PERCEPTRON step from the fixed
integer weight vector w0[b] = (h64(str(b)) % 2001) − 1000.

    logit_i = Σ_b tf_ib · w0[b]            (int64)
    pred_i  = [logit_i ≥ 0]                (the x44 keep rule)
    grad_b  = Σ_i (pred_i − y_i) · tf_ib   (int64)
    w1[b]   = w0[b] − grad_b               (learning rate 1 in units)

Every quantity is int64, so a SQL oracle reproduces the updated weight
vector exactly (x49). This is the genuine gradient of the perceptron
loss — featurize → score → predict → per-feature gradient aggregation
→ weight update is the entire fit loop except the sigmoid, which is
precisely the part whose float convergence stays bracketed by pytest
(tests/test_ml_quality.py) rather than hash-certified.

Scale shape: the (doc, bucket, tf) relation is corpus-sized but every
aggregation is keyed (doc_id or bucket); per-bucket partial aggregation
is map-side combinable and the output is bounded by N_FEATURES rows
regardless of corpus size. No broadcast grows with the corpus.

New module (not ml/quality.py) for the r5 window reason documented in
queries/__init__.py: quality.py is in 23 banked closures this round.
Fold-in is queued for the r6 consolidation batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.text import h64
from m5_competition_kaggle_spark.ml.quality import hashed_tf_pairs


def _w0(bucket: Column) -> Column:
    """x44's fixed deterministic weight: (h64(str(b)) % 2001) − 1000."""
    return F.pmod(h64(bucket.cast("string")), F.lit(2001)) - F.lit(1000)


def perceptron_step(
    df: DataFrame,
    label: Column,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One integer-exact perceptron update over the hashed-TF features.

    ``label`` must be an integer-deterministic {0,1} expression over
    ``df``'s columns (float-derived labels would reintroduce the
    cross-engine last-ulp risk this exists to remove). Returns one row
    per bucket observed in the corpus: (bucket, w0_units, grad_units,
    w1_units), the full before/gradient/after weight state.
    """
    tfp = hashed_tf_pairs(df, key_col, text_col)
    logits = (
        tfp.select(
            key_col, (F.col("tf") * _w0(F.col("bucket"))).alias("__u")
        )
        .groupBy(key_col)
        .agg(F.sum("__u").alias("__logit"))
    )
    # Every doc contributes an error term; token-less docs have no tfp
    # rows (logit 0 → pred 1, matching x44's empty-doc keep) and then
    # touch no bucket, so they drop out of the gradient on both engines.
    errs = (
        df.select(F.col(key_col), label.cast("long").alias("__y"))
        .join(logits, key_col, "left")
        .select(
            key_col,
            (
                (F.coalesce(F.col("__logit"), F.lit(0)) >= 0).cast("long")
                - F.col("__y")
            ).alias("__err"),
        )
    )
    grads = (
        tfp.join(errs, key_col)
        .groupBy("bucket")
        .agg(F.sum(F.col("__err") * F.col("tf")).alias("grad_units"))
    )
    return grads.select(
        "bucket",
        _w0(F.col("bucket")).alias("w0_units"),
        "grad_units",
        (_w0(F.col("bucket")) - F.col("grad_units")).alias("w1_units"),
    )
