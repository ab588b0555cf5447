"""Trailing-window distinct counts — COUNT(DISTINCT) over a sliding
range, which Spark's window functions cannot express directly
(``approx_count_distinct`` is the only windowed cardinality, and exact
``count_distinct`` over a moving frame is unsupported).

The scale rewrite is contribution expansion: each distinct
(entity, period) observation CONTRIBUTES to the ``window_n`` trailing
windows ending at periods ``p .. p + window_n - 1``, so explode each
observation to its target windows (bounded fan-out × window_n, all
literal arithmetic) and count distinct entities per target — every step
a keyed aggregate. This beats the self-join formulation (period table ×
window probe) by never materializing the per-period entity lists twice,
and beats windowed ``collect_set`` by never building a per-row set.

Fan-out cost is |distinct observations| × window_n rows through one
shuffle — at 100 TB you'd pre-aggregate observations per period (this
operator's first step does exactly that) so the explode runs on the
collapsed table, typically orders of magnitude smaller than the events.

Integer periods in, integer counts out → hash-exact SQL twin (g20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trailing_distinct_count(
    df: DataFrame,
    entity_col: str,
    period_col: str,
    window_n: int,
) -> DataFrame:
    """Exact distinct-``entity_col`` count over the trailing
    ``window_n`` periods, for every period observed in the data.

    Output: period, uniq (distinct entities seen in
    [period - window_n + 1, period]).
    """
    if int(window_n) < 1:
        # Mirrors the end>start guard on the interval operators
        # (ADVICE r6): window_n <= 0 would make F.sequence step
        # BACKWARDS, silently contributing to past periods.
        raise ValueError(f"window_n must be >= 1 (got {window_n})")
    obs = df.select(entity_col, period_col).distinct()
    contrib = obs.select(
        F.col(entity_col),
        F.explode(
            F.sequence(
                F.col(period_col),
                F.col(period_col) + F.lit(int(window_n) - 1),
            )
        ).alias("period"),
    )
    counts = contrib.groupBy("period").agg(
        F.countDistinct(entity_col).alias("uniq")
    )
    observed = df.select(
        F.col(period_col).alias("period")
    ).distinct()
    return counts.join(observed, "period")
