"""Benford first-significant-digit profile — a data-quality screen.

Naturally-occurring multi-magnitude amounts (prices, revenues,
populations) follow Benford's law, P(first digit = d) = log10(1+1/d);
fabricated or truncated data does not, so the deviation profile is a
standard forensic/data-quality check to run next to the null/range
screens of the DQ report (`queries/extensions_r7c.py` x103).

Determinism: the expected permille values are the hard-coded integer
constants floor(1000 * log10(1 + 1/d)) — no runtime floats — and the
first digit is taken from the decimal string rendering of the positive
BIGINT amount, which every engine prints identically. Observed shares
are exact integer permille (floor division).

Scale design: a single keyed count shuffle on (group, digit) — at most
9 digit cells per group — then a per-group window for totals over
those <= 9 rows. No per-row Python, no second pass over the data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# floor(1000 * log10(1 + 1/d)) for d = 1..9 — exact integer constants,
# shared verbatim with the SQL oracle.
BENFORD_PERMILLE = (301, 176, 124, 96, 79, 66, 57, 51, 45)


def benford_profile(
    df: DataFrame,
    amount_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """First-digit distribution of the positive BIGINT ``amount_col``
    per group, with the Benford expectation and signed deviation.

    Output: *group_cols, digit (1-9), n, n_total, obs_permille,
    exp_permille, dev_permille (= obs - exp). Non-positive amounts
    have no first significant digit and are excluded; digits that
    never occur in a group produce no row (the oracle mirrors this).
    """
    gcols = list(group_cols)
    digit = F.substring(
        F.col(amount_col).cast("string"), 1, 1
    ).cast("long")
    counted = (
        df.filter(F.col(amount_col) > 0)
        .withColumn("digit", digit)
        .groupBy(*gcols, "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    exp_arr = F.array(*[F.lit(v) for v in BENFORD_PERMILLE])
    return (
        counted.withColumn("n_total", F.sum("n").over(w_all))
        .withColumn(
            "obs_permille", F.expr("(1000 * n) DIV n_total")
        )
        .withColumn(
            "exp_permille",
            F.element_at(exp_arr, F.col("digit").cast("int")).cast(
                "long"
            ),
        )
        .withColumn(
            "dev_permille",
            F.col("obs_permille") - F.col("exp_permille"),
        )
        .select(
            *gcols,
            "digit",
            "n",
            "n_total",
            "obs_permille",
            "exp_permille",
            "dev_permille",
        )
    )
