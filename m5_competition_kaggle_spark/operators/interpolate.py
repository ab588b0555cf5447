"""Exact-rational linear interpolation of masked series points.

The upgrade of the LOCF gap-fill (g11): where LOCF carries the last
observation forward, linear interpolation reconstructs a missing point
from BOTH flanking observations,

    y(t) = y_prev + (y_next - y_prev) * (t - t_prev) / (t_next - t_prev)

With integer time index and integer (quantized) values the estimate is
the exact rational

    num = y_prev * (t_next - t_prev) + (y_next - y_prev) * (t - t_prev)
    den = t_next - t_prev

published as (num, den) plus the truncating quotient (DIV —
toward zero, identical in both engines), so the imputation
hash-certifies row-for-row — and, when the masked point's TRUE value
is known (a held-out audit), the signed quotient error certifies
imputation quality, not just mechanics.

Scale design: two partitioned window passes (last non-masked before,
first non-masked after) per group — no global window, no self-join.
The (t, y) neighbor pair is carried as ONE struct per direction taken
with a single ``last/first(..., ignorenulls=True)``, so both fields
always come from the same observation row (the r6 asof lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def linear_interpolate(
    df: DataFrame,
    group_cols: list[str],
    t_col: str,
    y_col: str,
    mask_col: str,
) -> DataFrame:
    """Append exact linear-interpolation columns for rows where
    ``mask_col`` is true, from the nearest non-masked neighbors in
    ``t_col`` order within each group.

    Output: input columns plus t_prev, y_prev, t_next, y_next and
    interp_num / interp_den / interp_q (truncating quotient); all NULL on
    non-masked rows and on masked rows missing either flank (series
    edges). ``t_col`` must be a unique integer key per group.
    """
    obs = F.when(
        ~F.col(mask_col),
        F.struct(F.col(t_col).alias("t"), F.col(y_col).alias("y")),
    )
    w_prev = (
        Window.partitionBy(*group_cols)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # "first non-masked AFTER t" is computed as "last non-masked
    # BEFORE t" under the REVERSED ordering: an unbounded-FOLLOWING
    # frame is re-evaluated from scratch per row by WindowExec
    # (O(n²) per series — measured 53 s vs 0.5 s on one 60k-row
    # series), while the reversed growing frame is incremental.
    w_next = (
        Window.partitionBy(*group_cols)
        .orderBy(F.desc(t_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.withColumn("__obs", obs)
        .withColumn(
            "__prev", F.last("__obs", ignorenulls=True).over(w_prev)
        )
        .withColumn(
            "__next", F.last("__obs", ignorenulls=True).over(w_next)
        )
    )
    ok = (
        F.col(mask_col)
        & F.col("__prev").isNotNull()
        & F.col("__next").isNotNull()
    )
    t = F.col(t_col).cast("long")
    tp, yp = F.col("__prev.t").cast("long"), F.col("__prev.y")
    tn, yn = F.col("__next.t").cast("long"), F.col("__next.y")
    num = yp * (tn - tp) + (yn - yp) * (t - tp)
    den = tn - tp
    return (
        out.withColumn("t_prev", F.when(ok, tp))
        .withColumn("y_prev", F.when(ok, yp))
        .withColumn("t_next", F.when(ok, tn))
        .withColumn("y_next", F.when(ok, yn))
        .withColumn("interp_num", F.when(ok, num))
        .withColumn("interp_den", F.when(ok, den))
        .withColumn(
            "interp_q",
            F.when(ok, F.expr(
                "(y_prev * (t_next - t_prev)"
                " + (y_next - y_prev)"
                f" * (CAST(`{t_col}` AS BIGINT) - t_prev))"
                " DIV (t_next - t_prev)"
            )),
        )
        .drop("__obs", "__prev", "__next")
    )
