"""Largest-remainder (Hamilton) apportionment of an integer budget.

The deterministic step of a training-data mixing plan: given a fixed
sample/token budget and per-source weights, hand every source
floor(budget * w_s / W) units, then distribute the leftover units one
each to the sources with the largest fractional remainders. Unlike the
probabilistic temperature mix (`operators/curation.py::
temperature_mix_stats`, keep-rate ∝ n^α), the output here is an EXACT
integer allocation that sums to the budget — what a batch scheduler or
shard-writer actually consumes.

Determinism: pure integer arithmetic — floor shares via DIV, the
remainder is the exact modulus (budget * w_s) % W, and remainder ties
break on the source key ascending. No floats, so the full allocation
table hash-certifies.

Scale design: one keyed aggregation reduces the input to one row per
source; the ranking window then runs over SOURCE-cardinality rows
(bounded by the catalog of sources, not the corpus — the q15/q18
single-partition precedent). Overflow contract: budget * max(w_s)
must stay below 2^63 (1e6 budget × 9e12 weight is safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def largest_remainder(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Exact integer apportionment of ``budget`` across ``key_col``
    proportional to summed ``weight_col``.

    Output: key, weight (per-key BIGINT sum), floor_share, remainder
    (= (budget*weight) % W), extra (0/1), share (floor + extra);
    sum(share) == budget whenever total weight > 0 and the number of
    keys with positive remainder covers the leftover (guaranteed,
    because leftover < #keys-with-positive-remainder's count bound:
    leftover = sum of fractional parts < number of keys).
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    weights = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(F.col(weight_col)).cast("long").alias("weight")
    )
    # A negative per-key weight breaks the allocation invariant
    # silently (DIV truncates toward zero, the remainder goes
    # negative, and sum(share) drifts off the budget); an all-zero
    # total would surface as a bare ANSI DIVIDE_BY_ZERO. Fail loudly
    # with the actual contract instead — the checks ride the
    # source-cardinality rows, not the corpus. Zero-weight keys are
    # fine (share 0), only the TOTAL must be positive.
    weights = weights.withColumn(
        "weight",
        F.when(F.col("weight") >= 0, F.col("weight")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "largest_remainder needs non-negative "
                        "per-key weights; key "
                    ),
                    F.col("key").cast("string"),
                    F.lit(" summed to "),
                    F.col("weight").cast("string"),
                )
            )
        ),
    )
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(
        F.col("remainder").desc(), F.col("key").asc()
    )
    scored = (
        weights.withColumn("w_total", F.sum("weight").over(w_all))
        .withColumn(
            "w_total",
            F.when(F.col("w_total") > 0, F.col("w_total")).otherwise(
                F.raise_error(
                    F.lit(
                        "largest_remainder needs a positive total "
                        "weight (all keys summed to 0)"
                    )
                )
            ),
        )
        .withColumn(
            "floor_share",
            F.expr(f"({budget} * weight) DIV w_total"),
        )
        .withColumn(
            "remainder",
            F.expr(f"({budget} * weight) % w_total"),
        )
        .withColumn(
            "leftover",
            F.lit(budget) - F.sum("floor_share").over(w_all),
        )
        .withColumn("rank", F.row_number().over(w_rank))
    )
    return (
        scored.withColumn(
            "extra",
            F.when(
                (F.col("rank") <= F.col("leftover"))
                & (F.col("remainder") > 0),
                1,
            ).otherwise(0).cast("long"),
        )
        .withColumn(
            "share", F.col("floor_share") + F.col("extra")
        )
        .select(
            F.col("key").alias(key_col),
            "weight",
            "floor_share",
            "remainder",
            "extra",
            "share",
        )
    )
