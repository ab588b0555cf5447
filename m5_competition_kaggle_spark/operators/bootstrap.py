"""Hash-Poisson bootstrap — deterministic error bars at scale.

The classic bootstrap resamples n rows WITH replacement B times —
impossible to do literally on a distributed table. The production
form is the Poisson bootstrap: each row enters replica b with weight
w ~ Poisson(1), independent per (row, replica), no global resample
needed. Here the Poisson draw is DERANDOMIZED: w is read off a
permille-quantized Poisson(1) CDF indexed by the shared md5-based
h64(row_id ++ '_' ++ b) — the same construction both engines compute
bit-identically (the x53 seeded-shuffle precedent), so the whole CI
hash-certifies while keeping the estimator's statistical shape.

Replica means are exact rationals (Σw·v, Σw); the interval is order
statistics of their truncating quotients across B replicas — integers all
the way down.

Scale design: the B-replica fan-out is a broadcast of a B-row range
to each partition (rows never shuffle for it), then ONE keyed
partial-aggregating shuffle on (group, b) and a B-row-per-group
window. Work is B·n map-side, B rows per group reduce-side.

r14 optimization (results bit-identical): the uniform draw is
materialized as its own column before the Poisson CDF CASE chain —
inlined, the md5→conv→pmod chain was evaluated once per CASE branch
(6× per row; measured 6.2s → 3.5s for the fan-out projection at
sf0.1·B=16) — and the point estimate is folded into the SAME
(group, b) aggregate as the replica sums (every row appears in every
replica exactly once, so any replica's count/sum IS the group's),
which drops the second full scan+join of the input the old separate
``point`` branch paid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from m5_competition_kaggle_spark.functions.text import h64

# Permille-quantized Poisson(1) CDF: P(W<=k)*1000 for k = 0..5;
# u in 0..999 below threshold[k] -> weight k, else 6.
POISSON1_CDF_PERMILLE = (368, 736, 920, 981, 996, 999)


def poisson_weight(u: Column) -> Column:
    """Map a uniform permille ``u`` (0..999) to a Poisson(1) draw."""
    w: Column = F.lit(6)
    for k in range(len(POISSON1_CDF_PERMILLE) - 1, -1, -1):
        w = F.when(u < POISSON1_CDF_PERMILLE[k], k).otherwise(w)
    return w


def poisson_bootstrap_ci(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    b: int = 16,
    lo_rank: int = 2,
    hi_rank: int = 15,
    hash_fn: str = "h64",
) -> DataFrame:
    """Per-group bootstrap interval of the mean of BIGINT
    ``value_col`` from ``b`` hash-Poisson replicas.

    Output per group: n, point_q (truncating-quotient mean — Spark
    ``DIV`` / DuckDB ``//`` truncate toward ZERO, which differs from
    floor when a group's sum is negative), n_reps (replicas with
    nonzero total weight), ci_lo_q / ci_hi_q (the lo_rank-th /
    hi_rank-th smallest replica truncating-quotient mean; ties broken
    by replica id). With the defaults (2, 15 of 16) that is the ~80%
    percentile interval.

    ``hash_fn``: "h64" (default) draws the replica uniforms from the
    md5-based cross-engine hash — SQL-replicable, what the certified
    query uses; "xx64" draws them from JVM ``xxhash64`` — ~10×
    faster (the md5 is ~all of the operator's cost at 16 replicas),
    same statistical construction, for production runs that don't
    need a DuckDB twin."""
    if not (1 <= lo_rank <= hi_rank <= b):
        raise ValueError("need 1 <= lo_rank <= hi_rank <= b")
    if hash_fn not in ("h64", "xx64"):
        raise ValueError("hash_fn must be 'h64' or 'xx64'")
    reps = df.sparkSession.range(b).select(
        F.col("id").alias("__b")
    )
    if hash_fn == "h64":
        # id→string cast hoisted above the B-way fan-out: once per
        # input row, not once per (row, replica).
        base = df.select(
            *group_cols, value_col,
            F.col(id_col).cast("string").alias("__id_s"),
        )
        u = F.pmod(
            h64(
                F.concat(
                    F.col("__id_s"),
                    F.lit("_"),
                    F.col("__b").cast("string"),
                )
            ),
            F.lit(1000),
        )
    else:
        base = df.select(*group_cols, value_col, id_col)
        u = F.pmod(
            F.xxhash64(F.col(id_col), F.col("__b")), F.lit(1000)
        )
    # __u materialized as a column: CollapseProject keeps a non-cheap
    # alias referenced 6 times, so codegen evaluates the hash ONCE per
    # (row, replica) instead of once per CASE branch.
    fanned = (
        base.crossJoin(F.broadcast(reps))
        .withColumn("__u", u)
        .withColumn("__w", poisson_weight(F.col("__u")))
    )
    # One pass: replica sums AND the unweighted group count/sum (every
    # row enters every replica exactly once, so each (group, b) cell
    # carries the group's own n and Σv — identical across b).
    per_rep = fanned.groupBy(*group_cols, "__b").agg(
        F.sum(F.col("__w") * F.col(value_col)).alias("__num"),
        F.sum("__w").alias("__den"),
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col)).alias("__s"),
    )
    rep_means = (
        per_rep.filter(F.col("__den") > 0)
        .withColumn("mean_q", F.expr("__num DIV __den"))
    )
    w_rank = Window.partitionBy(*group_cols).orderBy(
        "mean_q", "__b"
    )
    ranked = rep_means.withColumn(
        "__rn", F.row_number().over(w_rank).cast("long")
    )
    ci = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.max(
            F.when(F.col("__rn") == lo_rank, F.col("mean_q"))
        ).alias("ci_lo_q"),
        F.max(
            F.when(F.col("__rn") == hi_rank, F.col("mean_q"))
        ).alias("ci_hi_q"),
    )
    point = per_rep.groupBy(*group_cols).agg(
        F.max("__n").alias("n"),
        F.max("__s").alias("__s"),
    ).withColumn("point_q", F.expr("__s DIV n"))
    return point.join(F.broadcast(ci), group_cols, "left").select(
        *group_cols, "n", "point_q", "n_reps",
        "ci_lo_q", "ci_hi_q",
    )
