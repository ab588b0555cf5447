"""Rolling z-score anomaly flags with division-free integer algebra.

The streaming-adjacent monitoring primitive: flag a point that sits
more than z standard deviations from the mean of its OWN trailing
window (excluding itself, so an anomaly cannot mask itself). With
integer-quantized values the test rewrites without any division or
square root:

    (v − S/n)² > z² · (n·SS − S²)/n²   ⟺   (n·v − S)² > z² · (n·SS − S²)

(multiply both sides by n²; S = Σv, SS = Σv² over the trailing frame).
Every quantity is an int64 windowed sum, so the flags certify
bit-for-bit against a SQL twin (x85) — no float variance, no
order-of-summation risk.

Cost shape: ONE window sort per group key (S, SS, n all ride the same
ROWS frame); flags are a per-row expression. The caller bounds the
int64 budget: |v| ≤ V and window ≤ W require W²·V² and z²·W·V² within
int64 — milli-quantized meter values at W ≤ 1000 are comfortably in
range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore_flags(
    df: DataFrame,
    group_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    window_rows: int = 50,
    min_n: int = 10,
    z: int = 3,
) -> DataFrame:
    """All input columns plus win_n / win_sum / is_anomaly, where
    is_anomaly ⇔ the trailing ``window_rows`` predecessors (within the
    group, ordered by ``order_cols``) number at least ``min_n`` and the
    row's value fails the z-sigma test above."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-int(window_rows), -1)
    )
    v = F.col(value_col).cast("long")
    out = (
        df.withColumn("win_n", F.count(value_col).over(w).cast("long"))
        .withColumn("win_sum", F.sum(v).over(w))
        .withColumn("__ss", F.sum(v * v).over(w))
    )
    dev = out["win_n"] * v - out["win_sum"]
    var_n2 = out["win_n"] * F.col("__ss") - out["win_sum"] * out["win_sum"]
    return out.withColumn(
        "is_anomaly",
        (F.col("win_n") >= int(min_n))
        & (dev * dev > F.lit(int(z) * int(z)) * var_n2),
    ).drop("__ss")
