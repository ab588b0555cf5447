"""Deterministic seeded global shuffle — training-data ordering.

Training runs need the corpus in a pseudo-random order that is (a)
reproducible run-to-run and engine-to-engine (data-order determinism is
part of a training run's provenance), and (b) assignable WITHOUT a
global single-partition sort. Both come from the repo's standard
ingredients: the shuffle key is ``h64(f"{seed}:{key}")`` — changing the
seed is a completely new permutation, same key set — and the 1-based
global position in (hash, key) order is an exclusive running count via
``operators.prefix.global_running_sum`` (range-partition + per-partition
scan + broadcast offsets), so rank assignment scales like any other
keyed shuffle. x53 hash-certifies the full permutation against a SQL
``row_number() OVER (ORDER BY ...)`` twin.

Downstream: feed ``shuffle_pos`` to ``operators.prefix.pack_into_shards``
as the order column to pack shards in shuffled order, or range-write by
it to lay files out in training order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.text import h64
from m5_competition_kaggle_spark.operators.prefix import global_running_sum


def seeded_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 0,
    out_col: str = "shuffle_pos",
) -> DataFrame:
    """(key, shuffle_pos): the key's 1-based position in the seeded
    pseudo-random global order. Ties on the 60-bit hash (astronomically
    rare) break deterministically by key."""
    keyed = df.select(
        F.col(key_col),
        h64(
            F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))
        ).alias("__hk"),
    ).withColumn("__one", F.lit(1))
    ranked = global_running_sum(
        keyed, "__one", ("__hk", key_col), out_col
    )
    return ranked.select(key_col, F.col(out_col).cast("long").alias(out_col))
