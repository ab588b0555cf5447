"""Inter-demand gap statistics — the tail view of intermittency.

SBC classification (``operators/intermittency.py``) summarizes a
series by its MEAN inter-demand interval; replenishment decisions
hang on the TAIL: the longest dry spell, the p90 gap, how often the
gap exceeds the review period. Per key over the nonzero-demand
period indices:

- gaps g_k = t_k − t_{k−1} via one per-key lag window;
- max_gap, exact type-1 empirical p50/p90 gaps (k = ceil(u·n/1000),
  the pinball.py quantile convention — all integer), and the count
  of gaps beyond a caller threshold.

Scale design: one keyed window pass + one keyed aggregate. The
per-key gap array (sort_array ∘ collect_list, the croston.py fold
pattern) is bounded by the series' DEMAND count — sparse by
definition for the series this matters for, and never beyond the
calendar span for dense ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def demand_gap_stats(
    df: DataFrame,
    key_col: str,
    order_col: str,
    over_threshold: int = 30,
) -> DataFrame:
    """Per-key inter-demand gap profile.

    ``df``: one row per (key, integer period ``order_col``) nonzero
    demand. Keys with a single demand drop (no gap exists).

    Output per key: n_gaps, max_gap, p50_gap, p90_gap,
    n_over (gaps > ``over_threshold``)."""
    w = Window.partitionBy(key_col).orderBy("__t")
    gaps = (
        df.select(key_col, F.col(order_col).alias("__t"))
        .withColumn("__gap", F.col("__t") - F.lag("__t").over(w))
        .filter(F.col("__gap").isNotNull())
    )
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("__gap").alias("max_gap"),
        F.sum(
            (F.col("__gap") > F.lit(int(over_threshold))).cast("long")
        ).alias("n_over"),
        F.sort_array(F.collect_list("__gap")).alias("__arr"),
    )
    return agg.select(
        key_col,
        "n_gaps",
        "max_gap",
        F.expr(
            "element_at(__arr, CAST((500 * n_gaps + 999) DIV 1000"
            " AS INT))"
        ).alias("p50_gap"),
        F.expr(
            "element_at(__arr, CAST((900 * n_gaps + 999) DIV 1000"
            " AS INT))"
        ).alias("p90_gap"),
        "n_over",
    )
