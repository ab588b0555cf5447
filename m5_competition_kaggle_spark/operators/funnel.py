"""Strict-order funnel — per-entity step reachability and conversion.

The product-analytics staple the streaming funnel join (s7) and the
transition counts (g18) don't answer directly: of the entities that
did step 1, how many went on to step 2 AFTER it, and step 3 after
that? Order matters — a purchase before the first view must not
count — so each step's timestamp is the minimum OCCURRING STRICTLY
AFTER the previous step's, folded left to right:

    t1 = min ts(step1);  t_k = min ts(step_k) with ts > t_{k-1}

All integer-nanos min-aggregates: the result hash-certifies, and
NULL propagates naturally (never reached step k-1 ⇒ never reaches
step k).

Scale design: one keyed aggregation per step over the SAME
(entity, type, ts) reduction — k passes of map-side-combinable mins
joined entity-keyed, never a per-entity sort or collect. Conversion
counts are a final keyed rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_reach(
    events: DataFrame,
    entity_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    max_gap: int | None = None,
) -> DataFrame:
    """Per-entity strict-order step timestamps: one row per entity
    with t_1..t_k (integer ``ts_col`` of the first qualifying
    occurrence of each step, NULL once the chain breaks). With
    ``max_gap`` set, step k must also land within ``max_gap`` ts
    units of step k-1 — the "converted within 24h" form every
    funnel dashboard actually reports (an unbounded funnel over a
    long window converges to 100% for any active entity)."""
    if len(steps) < 2:
        raise ValueError("need at least 2 steps")
    if max_gap is not None and max_gap <= 0:
        raise ValueError("max_gap must be positive")
    base = events.select(
        F.col(entity_col).alias("entity"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    cur = base.select("entity").distinct()
    prev = None
    for i, step in enumerate(steps, start=1):
        col = f"t_{i}"
        filt = base.filter(F.col("__t") == step)
        if prev is not None:
            filt = filt.join(
                cur.select("entity", prev), "entity"
            ).filter(F.col("__ts") > F.col(prev))
            if max_gap is not None:
                filt = filt.filter(
                    F.col("__ts") <= F.col(prev) + int(max_gap)
                )
        agg = filt.groupBy("entity").agg(
            F.min("__ts").alias(col)
        )
        cur = cur.join(agg, "entity", "left")
        prev = col
    return cur


def funnel_conversion(
    reach: DataFrame, cohort_col: str, steps: int
) -> DataFrame:
    """Roll the per-entity reach table up to per-cohort step counts
    and conversion permilles: n_entities, reached_k for each step,
    conv_k_permille = 1000·reached_k DIV reached_1 (NULL when no
    entity started the funnel)."""
    aggs = [F.count(F.lit(1)).alias("n_entities")]
    for i in range(1, steps + 1):
        aggs.append(
            F.sum(
                F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"reached_{i}")
        )
    out = reach.groupBy(cohort_col).agg(*aggs)
    for i in range(2, steps + 1):
        out = out.withColumn(
            f"conv_{i}_permille",
            F.when(
                F.col("reached_1") > 0,
                F.expr(f"(1000 * reached_{i}) DIV reached_1"),
            ).cast("long"),
        )
    return out
