"""Deterministic quantiles (operators/quantiles.py)."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.quantiles import (
    DEFAULT_BIN_UNITS,
    exact_quantiles,
    hist_quantiles,
    hist_sketch,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
PERMILLES = (250, 500, 750, 900, 990)


def test_exact_matches_sorted_rank(spark):
    ev = load_table(spark, SF, "events")
    vals = sorted(
        r[0]
        for r in ev.select(
            F.expr("cast(floor(value * 1000000) as bigint)")
        ).collect()
    )
    n = len(vals)
    got = {
        r["permille"]: r["exact_units"]
        for r in exact_quantiles(ev, "value", PERMILLES).collect()
    }
    for p in PERMILLES:
        r = (p * n + 999) // 1000
        assert got[p] == vals[r - 1], (p, got[p], vals[r - 1])


def test_histogram_error_bound(spark):
    """est is the bin's lower edge: 0 <= exact - est < bin width."""
    ev = load_table(spark, SF, "events")
    exact = {
        r["permille"]: r["exact_units"]
        for r in exact_quantiles(ev, "value", PERMILLES).collect()
    }
    est = {
        r["permille"]: r["est_units"]
        for r in hist_quantiles(ev, "value", PERMILLES).collect()
    }
    for p in PERMILLES:
        err = exact[p] - est[p]
        assert 0 <= err < DEFAULT_BIN_UNITS, (p, err)


def test_sketch_merge_is_binwise_sum(spark):
    ev = load_table(spark, SF, "events")
    whole = hist_sketch(ev, "value")
    a = hist_sketch(ev.filter(F.col("event_id") % 2 == 0), "value")
    b = hist_sketch(ev.filter(F.col("event_id") % 2 == 1), "value")
    merged = (
        a.unionByName(b).groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_no_single_partition_exchange(spark):
    """The cumulative scans must use the two-phase prefix pattern, not
    a global no-partition window. The only SinglePartition exchange
    allowed is the 1-row global count() merge (inherently one row);
    every window must be partitioned (__pid — the prefix pattern)."""
    ev = load_table(spark, SF, "events")
    plan = (
        exact_quantiles(ev, "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            nxt = "".join(lines[i + 1: i + 2])
            assert "partial_count" in nxt, line + "\n" + nxt
        if "Window " in line:
            assert "__pid" in line, line


def test_one_pass_profile_equals_composed(spark):
    """quantile_error_profile (x52's r14 one-pass form) must be
    row-identical to the composed exact_quantiles ⋈ hist_quantiles —
    on the real table AND on sign-mixed values (v div bin_units must
    stay monotone through zero for the bin-end-cumulative fold)."""
    from m5_competition_kaggle_spark.operators.quantiles import (
        quantile_error_profile,
    )

    def composed(df, col):
        exact = exact_quantiles(df, col, PERMILLES)
        est = hist_quantiles(df, col, PERMILLES)
        return (
            exact.join(est, "permille")
            .select(
                "permille",
                "exact_units",
                "est_units",
                (F.col("exact_units") - F.col("est_units")).alias(
                    "err_units"
                ),
            )
        )

    ev = load_table(spark, SF, "events")
    got = sorted(
        map(tuple, quantile_error_profile(ev, "value", PERMILLES).collect())
    )
    want = sorted(map(tuple, composed(ev, "value").collect()))
    assert got == want

    neg = spark.range(0, 500).select(
        ((F.col("id") - 250) * 0.173).alias("value")
    )
    got = sorted(
        map(tuple, quantile_error_profile(neg, "value", PERMILLES).collect())
    )
    want = sorted(map(tuple, composed(neg, "value").collect()))
    assert got == want


def test_one_pass_profile_empty(spark):
    from m5_competition_kaggle_spark.operators.quantiles import (
        quantile_error_profile,
    )

    e = spark.createDataFrame([], "value double")
    assert quantile_error_profile(e, "value").count() == 0
