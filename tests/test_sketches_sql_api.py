"""Sketch-aggregate accuracy and the SQL API surface."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import load_table, register_views

SF = "/root/testdata/sf0.01"


def test_approx_sketches_accuracy(spark):
    """HLL++ distinct counts within 5% of exact; approx median within the
    declared rank error of the exact interpolated median."""
    from m5_competition_kaggle_spark.queries.extensions import (
        x17_approx_sketches,
    )

    approx = {r["event_type"]: r for r in x17_approx_sketches(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        rel = abs(approx[k]["approx_users"] - exact[k]["users"]) / exact[k]["users"]
        assert rel <= 0.05, (k, rel)
        # percentile_approx returns an actual data value near the median
        assert abs(approx[k]["approx_median"] - exact[k]["median"]) <= max(
            5.0, 0.05 * abs(exact[k]["median"])
        )


def test_sql_api_over_registered_views(spark):
    """The SQL entry point: register catalog views, run plain SQL —
    Catalyst produces the same plans as the DataFrame API."""
    register_views(spark, SF)
    got = spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    ).collect()
    want = (
        load_table(spark, SF, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # joins across views work too
    n = spark.sql(
        "SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).collect()[0][0]
    assert n == 60000


def test_hll_deterministic_sketch_accuracy(spark):
    """x45's from-scratch HLL: the integer register state must yield an
    estimate within the textbook error band (1.04/sqrt(64) ~ 13% std
    error; assert a loose 3-sigma bound) and be partitioning-invariant."""
    from m5_competition_kaggle_spark.queries.llm_curation import (
        x45_hll_distinct,
    )

    out = {
        r["source"]: r
        for r in x45_hll_distinct(spark, SF).collect()
    }
    assert out, "no sources"
    for src, r in out.items():
        assert r["err_permille"] <= 400, (src, dict(r.asDict()))
        assert 0 < r["used_buckets"] <= 64
        assert r["sum_scaled"] > 0
    # partitioning-invariance: max-register merge is order-independent,
    # so a different shuffle layout must give identical sketch state
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = {
            r["source"]: r["sum_scaled"]
            for r in x45_hll_distinct(spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert again == {s: r["sum_scaled"] for s, r in out.items()}


def test_hll_union_merge_property(spark):
    """The property that makes HLL distributable: the register state of
    A∪B equals the elementwise max of A's and B's registers — i.e., the
    per-(source,bucket) max-agg is a true monoid merge, so partial
    sketches from different partitions/files combine losslessly."""
    from pyspark.sql import functions as F

    from m5_competition_kaggle_spark.functions.text import h64, tokens
    from m5_competition_kaggle_spark.queries.llm_curation import (
        HLL_M,
        HLL_RANK_CAP,
    )

    def registers(df):
        hashed = (
            df.select(F.explode(tokens("text")).alias("t"))
            .filter(F.col("t") != "")
            .select(h64(F.col("t")).alias("h"))
            .select(
                F.pmod("h", F.lit(HLL_M)).alias("bucket"),
                F.expr(f"h div {HLL_M}").alias("val"),
            )
            .withColumn(
                "rank",
                F.when(F.col("val") == 0, F.lit(HLL_RANK_CAP)).otherwise(
                    F.least(
                        F.lit(55) - F.length(F.expr("bin(val)")),
                        F.lit(HLL_RANK_CAP),
                    )
                ),
            )
        )
        return {
            r["bucket"]: r["mj"]
            for r in hashed.groupBy("bucket")
            .agg(F.max("rank").alias("mj"))
            .collect()
        }

    a = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(i, f"delta{i} beta{i % 5} eps{i}") for i in range(40, 90)],
        "doc_id long, text string",
    )
    ra, rb, rab = registers(a), registers(b), registers(a.unionByName(b))
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert rab == merged
