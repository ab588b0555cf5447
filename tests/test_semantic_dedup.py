"""SemDeDup-style semantic dedup (operators/semantic_dedup.py)."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.semantic_dedup import (
    assign_clusters,
    semantic_dedup,
)
from m5_competition_kaggle_spark.operators.similarity import (
    exact_near_dup_pairs,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
THR = 350_000


def test_every_vector_assigned_once(spark):
    emb = load_table(spark, SF, "embeddings")
    assigned = assign_clusters(emb, 16)
    assert assigned.count() == emb.count()
    assert assigned.select("vid").distinct().count() == emb.count()
    cids = {r["cid"] for r in assigned.select("cid").distinct().collect()}
    assert cids <= set(range(16))


def test_drops_match_exact_pairs_within_clusters(spark):
    """keep=0 exactly when the EXACT all-pairs audit finds a lower-id
    neighbor >= threshold in the same cluster; canonical is the lowest
    such neighbor."""
    emb = load_table(spark, SF, "embeddings")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, THR, 16).collect()}
    cid = {
        r["vid"]: r["cid"]
        for r in assign_clusters(emb, 16).select("vid", "cid").collect()
    }
    pairs = exact_near_dup_pairs(emb, THR).collect()
    expected_canon: dict[int, int] = {}
    for r in pairs:  # id_a < id_b by construction
        if cid[r["id_a"]] == cid[r["id_b"]]:
            b = r["id_b"]
            expected_canon[b] = min(expected_canon.get(b, r["id_a"]),
                                    r["id_a"])
    dropped = {v for v, r in out.items() if r["keep"] == 0}
    assert dropped == set(expected_canon), (
        dropped ^ set(expected_canon)
    )
    for v, canon in expected_canon.items():
        assert out[v]["canonical_id"] == canon
    for v, r in out.items():
        if r["keep"] == 1:
            assert r["canonical_id"] == v


def test_cluster_minimum_always_kept(spark):
    emb = load_table(spark, SF, "embeddings")
    out = semantic_dedup(emb, THR, 16)
    mins = out.groupBy("cid").agg(F.min("vec_id").alias("m"))
    kept_mins = out.join(
        mins, (out["vec_id"] == mins["m"]) & (out["cid"] == mins["cid"])
    ).select("keep")
    assert all(r["keep"] == 1 for r in kept_mins.collect())


def test_auto_k_is_sqrt(spark):
    from m5_competition_kaggle_spark.operators.semantic_dedup import (
        auto_n_centroids,
    )

    assert auto_n_centroids(0) == 1
    assert auto_n_centroids(1) == 1
    assert auto_n_centroids(500) == 22
    assert auto_n_centroids(20_000) == 141
    emb = load_table(spark, SF, "embeddings")
    # auto mode = explicit sqrt(N) mode, bit for bit
    a = semantic_dedup(emb, THR, None).collect()
    b = semantic_dedup(emb, THR, auto_n_centroids(emb.count())).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lsh_variant_keep_rule_consistent(spark):
    """x57's bucketed variant obeys the same keep semantics within its
    cells: drops exactly the vectors the exact audit finds a lower-id
    >=threshold neighbor for in the SAME bucket."""
    from m5_competition_kaggle_spark.operators.semantic_dedup import (
        semantic_dedup_lsh,
    )

    emb = load_table(spark, SF, "embeddings")
    out = {r["vec_id"]: r for r in semantic_dedup_lsh(emb, THR).collect()}
    assert len(out) == emb.count()  # exactly one cell per vector
    cid = {v: r["cid"] for v, r in out.items()}
    pairs = exact_near_dup_pairs(emb, THR).collect()
    expected = set()
    for r in pairs:
        if cid[r["id_a"]] == cid[r["id_b"]]:
            expected.add(r["id_b"])
    assert {v for v, r in out.items() if r["keep"] == 0} == expected


def test_cells_capture_genuine_duplicates(spark):
    """Quantify the approximation on the structure SemDeDup targets:
    GENUINE duplicates (tiny perturbations of the same vector, cosine
    ≈ 0.99+). Both cell structures must co-locate nearly all such
    pairs — a recall collapse here breaks the operator's purpose. (At
    loose thresholds like cosine 0.35 over random vectors, cells
    legitimately split most 'pairs'; that regime belongs to x12's
    multi-table LSH, not cluster dedup.)"""
    from m5_competition_kaggle_spark.operators.semantic_dedup import (
        semantic_dedup_lsh,
    )

    n_base = 200
    base = spark.range(n_base).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> cast("
            "(pmod(xxhash64(id, i), 2001) - 1000) / 1000.0 as float))"
        ).alias("embedding"),
    )
    # duplicate of vector v: independent ±1%-of-scale noise per
    # component — can flip a hyperplane only when the plane dot is
    # already near zero, so dups stay co-located almost always
    dup = base.select(
        (F.col("vec_id") + n_base).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> cast(x + "
            "(pmod(xxhash64(vec_id, i, 7), 21) - 10) / 1000.0 as float))"
        ).alias("embedding"),
    )
    vecs = base.unionByName(dup)
    true_pairs = [(i, i + n_base) for i in range(n_base)]
    cid_k = {
        r["vid"]: r["cid"]
        for r in assign_clusters(vecs, None).select("vid", "cid").collect()
    }
    cid_l = {
        r["vec_id"]: r["cid"]
        for r in semantic_dedup_lsh(vecs, 10**9).collect()
    }
    rec_k = sum(cid_k[a] == cid_k[b] for a, b in true_pairs) / n_base
    rec_l = sum(cid_l[a] == cid_l[b] for a, b in true_pairs) / n_base
    assert rec_k >= 0.95, rec_k
    assert rec_l >= 0.95, rec_l


def test_intra_cluster_join_is_keyed(spark):
    """The near-dup comparison must plan as an equi-join on cid — the
    only cross join is the bounded broadcast centroid assignment."""
    emb = load_table(spark, SF, "embeddings")
    plan = semantic_dedup(emb, THR, 16)._jdf.queryExecution() \
        .executedPlan().toString()
    for line in plan.splitlines():
        if "CartesianProduct" in line:
            raise AssertionError(line)
        if "BroadcastNestedLoopJoin" in line:
            # allowed only for the centroid fan-out (broadcast side is
            # the <=16-row centroid table)
            assert "cv" in plan
