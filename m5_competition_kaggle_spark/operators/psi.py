"""Population stability index (PSI) — categorical drift between periods.

PSI = sum_k (p_k - q_k) * ln(p_k / q_k) over category shares p (the
reference window) and q (the comparison window) is the standard
production drift monitor for categorical/binned features — the
tabular twin of x106's token-vocabulary drift and the batch twin of
x101's CUSUM mean-shift detector. Rule of thumb: PSI < 0.1 stable,
0.1–0.25 drifting, > 0.25 action.

Certification: per-category counts and totals are exact int64; the
psi_term is the SAME double expression tree in both engines (the
x107 mutual-information precedent — the harness rounds floats to 6
significant digits). Categories absent from either window are
reported with a NULL psi_term rather than an infinity or a smoothing
constant — the monitor's job is to surface them, not paper over them.

Scale shape: one keyed aggregate per window over pre-filtered scans,
a full-outer join on category (output bounded by |categories|), one
1-row totals aggregate broadcast back. The two window scans push
their period predicate down to the source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_term_col(
    c_ref: Column, c_cmp: Column, n_ref: Column, n_cmp: Column
) -> Column:
    """The PSI term (p - q) * ln(p / q) with p = c_ref/n_ref and
    q = c_cmp/n_cmp, NULL when either count is 0 — ONE expression tree
    shared by the split monitor (x114) and the per-day trajectory
    monitor (s17) so both certify against the same SQL rendering."""
    p = c_ref.cast("double") / n_ref
    q = c_cmp.cast("double") / n_cmp
    return F.when((c_ref > 0) & (c_cmp > 0), (p - q) * F.log(p / q))


def psi_terms(
    ref: DataFrame, cmp: DataFrame, cat_col: str
) -> DataFrame:
    """Per-category PSI terms between two already-filtered windows.

    Output per category in either window: ``cat``, ``c_ref``,
    ``c_cmp`` (counts, 0 when absent), ``n_ref``, ``n_cmp`` (window
    totals) and ``psi_term`` (double; NULL when the category is
    absent from either window). Sum of non-NULL psi_terms is the PSI
    over the shared support.
    """
    rc = ref.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("c_ref")
    )
    cc = cmp.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("c_cmp")
    )
    return psi_from_counts(rc, cc)


def psi_from_counts(rc: DataFrame, cc: DataFrame) -> DataFrame:
    """PSI assembly from already-aggregated count tables — the stage
    the streaming monitor (``streaming/psi_monitor.py``) re-runs per
    trigger over its bounded category-count state. ``rc``: (cat,
    c_ref); ``cc``: (cat, c_cmp). Same output contract as
    :func:`psi_terms`.

    The category join is NULL-SAFE: a NULL category (a real level
    under GROUP BY semantics) matches itself across the two windows
    instead of splitting into two unmatched half-rows that would
    double-count its mass in the totals."""
    r2 = rc.withColumnRenamed("cat", "__rcat")
    cats = (
        r2.join(
            cc,
            F.col("__rcat").eqNullSafe(F.col("cat")),
            "full_outer",
        )
        .withColumn(
            "cat",
            F.when(F.col("__rcat").isNotNull(), F.col("__rcat"))
            .otherwise(F.col("cat")),
        )
        .drop("__rcat")
        .withColumn("c_ref", F.coalesce("c_ref", F.lit(0)))
        .withColumn("c_cmp", F.coalesce("c_cmp", F.lit(0)))
    )
    totals = cats.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cmp").alias("n_cmp")
    )
    return (
        cats.crossJoin(F.broadcast(totals))
        .withColumn(
            "psi_term",
            psi_term_col(
                F.col("c_ref"), F.col("c_cmp"),
                F.col("n_ref"), F.col("n_cmp"),
            ),
        )
    )
