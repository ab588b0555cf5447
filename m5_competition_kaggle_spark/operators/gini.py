"""Exact-integer Gini concentration by group, from grouped value cells.

The Lorenz-curve complement to the HHI screen
(`operators/concentration.py`): HHI reads top-heaviness through the sum
of squared shares (dominated by the few largest members), the Gini
coefficient reads the WHOLE inequality profile — a catalog where half
the parts never sell moves Gini long before it moves HHI. Classic uses
on a training-data pipeline: sales concentration per brand/category,
token-mass concentration per source, shard-size imbalance per writer,
and (via `gini_from_cells` on the streaming monitor's day buckets) the
daily value-concentration trajectory.

Exactness: with members sorted by value ascending and ranked 1..n,

    G = (2 * sum_i i*q_i - (n+1) * S) / (n * S),      S = sum q_i.

Ties make "the" rank ambiguous, so the kernel computes the rank sum on
VALUE CELLS (one row per distinct value with its member count) where
consecutive tied ranks have a closed form: a cell with count c entered
after A_prev earlier members contributes

    q * (c * A_prev + (c * (c + 1)) DIV 2)

to sum_i i*q_i — exact integers (c*(c+1) is always even), identical in
any engine, and the result is tie-order invariant (the only Gini that
is well-defined under ties).

Scale design: one shuffle to the (group, value) cells, then
per-group ordered windows whose state is one row per DISTINCT value —
the ksdist cell pattern. Zero-valued members count (they hold ranks
and widen inequality); all-zero groups have no defined Gini and emit
NULL. Overflow contract: n^2 * max_value per group must stay below
2^63 — document and rescale values beyond (e.g. unit quantities for
~3e9 member-units per group).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gini_from_cells(
    cells: DataFrame, part_cols: Sequence[str]
) -> DataFrame:
    """Exact Gini from pre-aggregated value cells — the shared kernel
    (the `ksdist.ks_from_cells` relationship): one row per
    (*part_cols, q) with BIGINT member count ``c`` (q >= 0, unique
    within a partition). The streaming monitor's bounded day-bucket
    aggregate IS this shape, so batch and stream assemble the
    identical statistic.

    NULL q cells are dropped (a NULL value has no place on the value
    axis — the ksdist ECDF convention). Output one row per partition:
    *part_cols, n_members, total, max_value, top_share_ppm (the
    largest single VALUE's share — on cells the largest member value),
    rank_mass (= sum_i i*q_i), gini_ppm (NULL when total == 0;
    floor division, so in [0, 10^6) exactly)."""
    pcols = list(part_cols)
    cells = cells.filter(F.col("q").isNotNull())
    w_cum = (
        Window.partitionBy(*pcols)
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = cells.withColumn(
        "a_prev", F.sum("c").over(w_cum) - F.col("c")
    ).withColumn(
        "rank_mass_cell",
        F.col("q")
        * (
            F.col("c") * F.col("a_prev")
            + F.expr("(c * (c + 1)) DIV 2")
        ),
    )
    return (
        scored.groupBy(*pcols)
        .agg(
            F.sum("c").alias("n_members"),
            F.sum(F.col("q") * F.col("c")).alias("total"),
            F.max("q").alias("max_value"),
            F.sum("rank_mass_cell").alias("rank_mass"),
        )
        .select(
            *pcols,
            "n_members",
            "total",
            "max_value",
            F.expr(
                "CASE WHEN total > 0 THEN"
                " (1000000 * max_value) DIV total END"
            ).alias("top_share_ppm"),
            "rank_mass",
            F.expr(
                "CASE WHEN total > 0 THEN"
                " (1000000 * (2 * rank_mass"
                "   - (n_members + 1) * total))"
                " DIV (n_members * total) END"
            ).alias("gini_ppm"),
        )
    )


def gini_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Exact Gini concentration of BIGINT ``value_col`` (>= 0) over
    the members of each group — one input row per member; the
    row-level wrapper over ``gini_from_cells``.

    Output one row per group: *group_cols, n_members, total,
    max_value, top_share_ppm, rank_mass, gini_ppm."""
    gcols = list(group_cols)
    cells = df.groupBy(
        *gcols, F.col(value_col).alias("q")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return gini_from_cells(cells, gcols)
