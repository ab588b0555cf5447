"""Rank-based ROC-AUC (Mann-Whitney) over bounded score cells — the
binary-classifier quality metric the calibration (x112) and gains/lift
(x133) monitors still lacked.

AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻). The textbook
computation sorts ALL rows in one global rank window — a single-
partition scale-killer. This operator instead aggregates to SCORE
CELLS first: group by (group, score) → (n_pos, n_neg) per cell, then
one keyed window over the cells ordered by score accumulates the
negatives strictly below each score. The window's partition count is
the group count and its row count is bounded by the number of
DISTINCT scores (quantized scores ⇒ a few thousand cells), never the
corpus row count:

    2·U = Σ_s [ 2·n_pos(s)·cumneg_below(s) + n_pos(s)·n_neg(s) ]
    auc_ppm = 1_000_000 · 2U DIV (2 · n_pos · n_neg)

All integer, truncating quotient — hash-certifies against the same
arithmetic in DuckDB. Ties are handled exactly (the ½ mass is the
n_pos·n_neg term, kept doubled to stay integral). Overflow contract:
n_pos·n_neg per group must stay below ~4.6·10¹⁸ (int64 after the ×2),
i.e. ~2·10⁹ rows per class per group; shard the group key beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def auc_from_cells(
    cells: DataFrame,
    group_cols: list[str],
    score_col: str = "score",
    pos_col: str = "c_pos",
    neg_col: str = "c_neg",
) -> DataFrame:
    """AUC over pre-aggregated score cells — the entry the streaming
    monitor shares (its day-bucket store already holds (day, score,
    c_pos, c_neg) cells; re-aggregating rows would be impossible
    there and wasteful everywhere).

    ``cells``: rows of (group…, score, class counts). Duplicate
    (group…, score) cells are merged here first — a union of two cell
    tables (e.g. re-assembling update-mode deltas) is a valid input;
    without the merge the ROWS-frame cumulative below would split tied
    scores arbitrarily between "strictly below" and "tied" and the AUC
    would be nondeterministically wrong. The merge groups by the same
    keys the input is usually already partitioned on, so Catalyst
    plans it without an extra exchange in the row-level path.
    Output per group: n_pos, n_neg, n_scores, auc_ppm (NULL when
    either class is empty — AUC undefined)."""
    cells = cells.groupBy(*group_cols, score_col).agg(
        F.sum(pos_col).cast("long").alias(pos_col),
        F.sum(neg_col).cast("long").alias(neg_col),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = cells.withColumn(
        "__cumneg",
        F.coalesce(F.sum(neg_col).over(w), F.lit(0)),
    ).withColumn(
        "__u2",
        2 * F.col(pos_col) * F.col("__cumneg")
        + F.col(pos_col) * F.col(neg_col),
    )
    agg = scored.groupBy(*group_cols).agg(
        F.sum(pos_col).cast("long").alias("n_pos"),
        F.sum(neg_col).cast("long").alias("n_neg"),
        F.count(F.lit(1)).alias("n_scores"),
        F.sum("__u2").cast("long").alias("__u2_sum"),
    )
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        "n_scores",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr("1000000 * __u2_sum DIV (2 * n_pos * n_neg)"),
        ).alias("auc_ppm"),
    )


def group_auc(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group ROC-AUC of integer ``score_col`` against 0/1
    ``label_col``.

    Output per group: n_pos, n_neg, n_scores (distinct score cells),
    auc_ppm (NULL when either class is empty — AUC undefined)."""
    cells = df.groupBy(group_col, score_col).agg(
        F.sum(F.col(label_col).cast("long")).alias("c_pos"),
        F.sum(F.lit(1) - F.col(label_col).cast("long")).alias("c_neg"),
    )
    return auc_from_cells(
        cells, [group_col], score_col=score_col
    )
