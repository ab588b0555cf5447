"""Two-sample Cramér–von Mises gap energy, permille-quantized exact
integers.

The KS statistic (`operators/ksdist.py`) reads only the WORST point of
the ECDF gap; Cramér–von Mises integrates the SQUARED gap over the
whole pooled distribution, so it sees broad low-amplitude drift that a
single-point max misses (the classic KS blind spot: many small shifts
across the support). This module is the CvM assembly over the *same*
count-cell shape `ks_from_cells` consumes — one cell scan, two
complementary drift readouts.

Determinism contract (the ksdist one): callers pass pre-aggregated
BIGINT count cells on an integer-quantized support, so every quantity
below is an exact integer both engines reproduce bit-for-bit:

    gap_pm(q)   = (1000 * |n_cmp * cum_ref(q) - n_ref * cum_cmp(q)|)
                    DIV (n_ref * n_cmp)        -- floored permille gap
    gap_energy  = sum_q  (c_ref(q) + c_cmp(q)) * gap_pm(q)^2
    omega2_micro = gap_energy DIV (n_ref + n_cmp)

`omega2_micro` is 10^6 * INTEGRAL (F_ref - F_cmp)^2 dH_pooled computed
on the permille-floored gap — the CvM effect size (the nm/(n+m)
null-calibration factor is a lookup-table concern, not a monitor's).
Quantizing the gap to permille BEFORE squaring is what keeps the energy
inside int64 at any corpus size: the exact-rational numerator
sum c*(m*a - n*b)^2 grows like n^5 and leaves int64 near n ~ 6e3.

Overflow contract: the permille product 1000 * n_cmp * cum_ref must
stay below 2^63 — holds to n_ref * n_cmp < 9.2e15, i.e. ~9.6e7 rows
per side per partition. Beyond that, hash-sample a side or coarsen the
quantization; the cells (one row per distinct quantized value) are
unaffected.

Scale design: identical to ks_from_cells — one shuffle to the cells,
then per-partition ordered windows whose state is one row per DISTINCT
quantized value, never per input row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cvm_from_cells(
    cells: DataFrame, part_cols: Sequence[str]
) -> DataFrame:
    """CvM gap energy from count cells.

    ``cells``: one row per (*part_cols, q) with BIGINT counts
    ``c_ref`` / ``c_cmp`` (either may be 0; q unique within a
    partition). Output one row per partition present on BOTH sides:
    *part_cols, n_ref, n_cmp, n_cells, gap_energy, omega2_micro.

    NULL q cells are dropped (the ksdist ECDF convention).
    """
    pcols = list(part_cols)
    cells = cells.filter(F.col("q").isNotNull())
    w_cum = (
        Window.partitionBy(*pcols)
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*pcols)
    scored = (
        cells.withColumn("cum_ref", F.sum("c_ref").over(w_cum))
        .withColumn("cum_cmp", F.sum("c_cmp").over(w_cum))
        .withColumn("n_ref", F.sum("c_ref").over(w_all))
        .withColumn("n_cmp", F.sum("c_cmp").over(w_all))
        .filter((F.col("n_ref") > 0) & (F.col("n_cmp") > 0))
        .withColumn(
            "gap_pm",
            F.expr(
                "(1000 * abs(n_cmp * cum_ref - n_ref * cum_cmp))"
                " DIV (n_ref * n_cmp)"
            ),
        )
    )
    return (
        scored.groupBy(*pcols, "n_ref", "n_cmp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(
                (F.col("c_ref") + F.col("c_cmp"))
                * F.col("gap_pm")
                * F.col("gap_pm")
            ).alias("gap_energy"),
        )
        .select(
            *pcols,
            "n_ref",
            "n_cmp",
            "n_cells",
            "gap_energy",
            F.expr(
                "gap_energy DIV (n_ref + n_cmp)"
            ).alias("omega2_micro"),
        )
    )


def cvm_statistic(
    ref: DataFrame,
    cmp_w: DataFrame,
    group_col: str,
    q_col: str,
) -> DataFrame:
    """Per-group CvM gap energy between ``ref`` and ``cmp_w`` over the
    quantized BIGINT column ``q_col`` — the row-level wrapper, same
    union-then-count shape as ``ksdist.ks_statistic``. One-sided
    groups have no defined statistic and are dropped."""
    sides = ref.select(
        F.col(group_col).alias("grp"),
        F.col(q_col).alias("q"),
        F.lit(0).alias("side"),
    ).unionAll(
        cmp_w.select(
            F.col(group_col).alias("grp"),
            F.col(q_col).alias("q"),
            F.lit(1).alias("side"),
        )
    )
    cells = sides.groupBy("grp", "q").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias(
            "c_ref"
        ),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias(
            "c_cmp"
        ),
    )
    return cvm_from_cells(cells, ["grp"]).withColumnRenamed(
        "grp", group_col
    )
