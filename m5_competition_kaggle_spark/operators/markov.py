"""First-order Markov sequence surprisal — anomalous-timeline scoring.

The transition-count matrix (queries/analytics.py g18) says what the
corpus's typical event grammar IS; this kernel scores every individual
timeline against it: each observed transition a -> b contributes its
surprisal -ln P(b|a) = ln c(a,.) - ln c(a,b) under the corpus
maximum-likelihood model, and a key whose MEAN surprisal is high keeps
doing what the population rarely does — the sequence-level anomaly
screen (bot detection, broken instrumentation, scraper sessions) that
per-event z-scores (operators/anomaly.py) cannot see.

Exactness: counts are exact integers; logs enter only through
L(x) = round(ln(x) * 1e6) on BIGINTs — micro-nat integers that are
bit-identical across engines on this platform (the x32/x63/x167
raw-double-ln precedent) — so per-transition surprisal
s(a,b) = L(c_a) - L(c_ab) >= 0 and every downstream sum/floor-div is
integer arithmetic a SQL oracle reproduces exactly.

Scale design: transitions come from a per-key ordered window (keyed
shuffle — distributes across keys); the model is |states|^2 rows
(event grammars are small by construction) and broadcasts back onto
the transition stream, so the whole plan is ONE keyed window + one
keyed aggregation + a broadcast hash join — no global sort, no
quadratic anything. The model is fitted on the same corpus it scores
(in-corpus ML scoring): deterministic, no split to manage, and every
c_ab >= 1 by construction so the logs are always defined.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LOG_Q = 1_000_000  # micro-nat quantization of ln


def transition_pairs(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """(key, a, b) consecutive-state pairs per key timeline, ordered
    by ``order_cols`` (must be a unique key within a timeline — ties
    would make "consecutive" ambiguous). Timelines with one row emit
    nothing (lag is NULL)."""
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.lag(F.col(state_col)).over(w).alias("a"),
            F.col(state_col).alias("b"),
        )
        .filter(F.col("a").isNotNull())
    )


def transition_surprisal(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """Per-key mean transition surprisal under the corpus model.

    Output one row per key with >= 1 transition: key, n_trans,
    sum_surprisal_unat (micro-nats), mean_surprisal_unat
    (= sum DIV n_trans; both sides nonnegative so floor division is
    engine-agnostic)."""
    pairs = transition_pairs(df, key_col, state_col, order_cols)
    c_ab = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("c_ab")
    )
    c_a = c_ab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    model = c_ab.join(c_a, "a").select(
        "a",
        "b",
        F.expr(
            f"CAST(round(ln(c_a) * {LOG_Q}) AS BIGINT)"
            f" - CAST(round(ln(c_ab) * {LOG_Q}) AS BIGINT)"
        ).alias("s_unat"),
    )
    return (
        pairs.join(F.broadcast(model), ["a", "b"])
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trans"),
            F.sum("s_unat").alias("sum_surprisal_unat"),
        )
        .withColumn(
            "mean_surprisal_unat",
            F.expr("sum_surprisal_unat DIV n_trans"),
        )
    )
