"""Bucketed co-located joins and spark.ml LSH alternates.

Bucketing is the 100 TB co-location strategy: writing both join sides
``bucketBy(N, key)`` lets a later equi-join run with NO shuffle on either
side — asserted here on the physical plan.

spark.ml's MinHashLSH / BucketedRandomProjectionLSH are the library
alternates to the hand-rolled operators (SURVEY §4: "available via
spark.ml feature transformers"); smoke-tested so the engine demonstrably
interoperates with them.
"""

import pytest


def test_bucketed_join_has_no_shuffle(spark):
    # warehouse dir is a static conf — use the session default and drop the
    # tables afterwards (gitignored spark-warehouse/)
    orders = spark.createDataFrame(
        [(i, float(i) * 10) for i in range(1000)], "k long, amount double"
    )
    customers = spark.createDataFrame(
        [(i, f"c{i}") for i in range(200)], "k long, name string"
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customers")
    orders.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_orders")
    customers.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_customers")

    # at this size Catalyst prefers broadcast; disable it to surface the
    # bucketed sort-merge path (at real scale the big-big join takes it)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_customers"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert "Bucketed: true" in plan
        assert joined.count() == 200

        # control: the same join on unbucketed frames DOES shuffle;
        # bucketing is what removed the exchanges
        plain = orders.join(customers, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customers")


def test_sparkml_minhash_lsh_alternate(spark):
    pytest.importorskip("pyspark.ml.feature")
    from pyspark.ml.feature import MinHashLSH, Tokenizer, HashingTF

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different content entirely unrelated"),
        ],
        "doc_id long, text string",
    )
    toks = Tokenizer(inputCol="text", outputCol="toks").transform(docs)
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=1 << 14,
                   binary=True).transform(toks)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(tf)
    pairs = model.approxSimilarityJoin(tf, tf, 0.5, distCol="dist").filter(
        "datasetA.doc_id < datasetB.doc_id"
    )
    got = {
        (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
        for r in pairs.collect()
    }
    assert (1, 2) in got        # near-dup pair found
    assert (1, 3) not in got    # unrelated pair excluded


def test_sparkml_random_projection_lsh_alternate(spark):
    pytest.importorskip("pyspark.ml.feature")
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors

    vecs = spark.createDataFrame(
        [
            (1, Vectors.dense([1.0, 0.0, 0.0])),
            (2, Vectors.dense([0.99, 0.05, 0.0])),
            (3, Vectors.dense([-1.0, 0.0, 0.0])),
        ],
        ["vec_id", "features"],
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5,
        numHashTables=4, seed=42,
    ).fit(vecs)
    nn = model.approxNearestNeighbors(vecs, Vectors.dense([1.0, 0.0, 0.0]), 2)
    ids = [r["vec_id"] for r in nn.collect()]
    assert ids[0] == 1 and 2 in ids
