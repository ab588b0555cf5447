"""Tests for the two-phase global prefix sum and sequence packing —
equivalence with the single-partition formulation on planted data, and
the shard-boundary rule. Cross-engine values are pinned by the x26
oracle (scripts/check_oracle.py)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from m5_competition_kaggle_spark.operators.prefix import (
    global_running_sum,
    pack_into_shards,
)


def test_global_running_sum_matches_single_partition(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    got = {
        r["k"]: r["running_sum"]
        for r in global_running_sum(df, "v", ("k",)).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        r["k"]: r["ref"]
        for r in df.withColumn("ref", F.sum("v").over(w)).collect()
    }
    assert got == expected


def test_global_running_sum_no_single_partition_exchange(spark):
    from m5_competition_kaggle_spark.operators.prefix import (
        _ranged_local_sums,
    )

    df = spark.createDataFrame([(i, 1) for i in range(100)], "k long, v long")
    plan = global_running_sum(df, "v", ("k",))._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # the REAL computation (lineage-truncated by the localCheckpoint)
    # range-partitions and windows per physical partition
    phase1 = _ranged_local_sums(
        df, "v", ("k",)
    )._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in phase1.lower()
    assert "SinglePartition" not in phase1


def test_pack_into_shards_boundary_rule(spark):
    # sizes 3,3,3 with budget 4: start offsets 0,3,6 -> shards 0,0,1
    df = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 3)], "k long, n long"
    )
    got = {
        r["k"]: r["shard_id"]
        for r in pack_into_shards(df, "n", ("k",), 4).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1}


def test_global_running_sum_leaves_no_cache_entries(spark):
    """r10 VERDICT defect 1: the operator used to .persist() its ranged
    intermediate and never unpersist — one CacheManager entry leaked per
    CALL (CacheManager entries are plan-keyed and invisible to GC, so a
    long-lived session accumulated them without bound; heaps.py chains
    THREE calls per invocation). The localCheckpoint rework must leave
    the CacheManager empty after every call while still producing the
    same sums; the checkpoint blocks themselves are ContextCleaner-
    managed (dropped on GC), not plan-keyed."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    # other suites may have leaked entries into the shared session
    # (the dedup/curation persist sites are r12 cleanup work) — start
    # from a clean slate so the assertion isolates THIS operator
    spark.catalog.clearCache()
    assert cm.isEmpty()
    rows = [(i, (i * 3) % 7 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    expected = None
    for _ in range(3):
        got = {
            r["k"]: r["running_sum"]
            for r in global_running_sum(df, "v", ("k",)).collect()
        }
        expected = expected or got
        assert got == expected
        assert cm.isEmpty(), "global_running_sum leaked a cache entry"


def test_vocab_growth_chain_leaves_no_cache_entries(spark):
    """The three-scan composition that surfaced the leak (heaps.py) —
    plus the ttr_ppm zero-guard: an all-empty-text corpus must yield
    NULL ratios, not a Spark/DuckDB divergence (NULL vs div-by-zero)."""
    from m5_competition_kaggle_spark.operators.heaps import (
        vocab_growth_deciles,
    )

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta token{i % 4} zz{i % 3}")
         for i in range(40)],
        "doc_id long, text string",
    )
    out = vocab_growth_deciles(docs).orderBy("decile").collect()
    assert [r["decile"] for r in out] == list(range(1, 11))
    assert all(r["ttr_ppm"] is not None for r in out)
    # cumulative columns are nondecreasing along deciles
    toks = [r["tokens_cum"] for r in out]
    tys = [r["types_cum"] for r in out]
    assert toks == sorted(toks) and tys == sorted(tys)
    assert cm.isEmpty(), "vocab_growth_deciles leaked cache entries"

    empty = spark.createDataFrame(
        [(i, "") for i in range(20)], "doc_id long, text string"
    )
    out2 = vocab_growth_deciles(empty).orderBy("decile").collect()
    assert all(r["ttr_ppm"] is None for r in out2)
    assert all(r["tokens_cum"] == 0 for r in out2)


# ---------------------------------------------------------------- properties

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=60
    ),
    budget=st.integers(min_value=1, max_value=64),
)
def test_pack_shards_matches_python_scan(spark, sizes, budget):
    """∀ size sequences: distributed packing == a sequential Python scan
    (shard = start offset div budget)."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "k long, n long"
    ).repartition(5)
    got = {
        r["k"]: r["shard_id"]
        for r in pack_into_shards(df, "n", ("k",), budget).collect()
    }
    offset, expected = 0, {}
    for i, s in enumerate(sizes):
        expected[i] = offset // budget
        offset += s
    assert got == expected


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_multi_scan_equals_chained_singles(spark, rows):
    """∀ inputs: global_running_sums over several value columns ==
    chaining global_running_sum per column (the x157 collapse)."""
    from m5_competition_kaggle_spark.operators.prefix import (
        global_running_sum,
        global_running_sums,
    )

    df = spark.createDataFrame(rows, "k long, a long, b long").repartition(4)
    multi = {
        r["k"]: (r["ca"], r["cb"])
        for r in global_running_sums(
            df, ("a", "b"), ("k",), ("ca", "cb")
        ).collect()
    }
    chained = {
        r["k"]: (r["ca"], r["cb"])
        for r in global_running_sum(
            global_running_sum(df, "a", ("k",), "ca"), "b", ("k",), "cb"
        ).collect()
    }
    assert multi == chained
