"""Semantic tests for connected-components dedup clustering: planted
graphs with known components; the cross-engine contract is pinned by the
x24 DuckDB recursive-CTE oracle (scripts/check_oracle.py)."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.graph import (
    connected_components,
    connected_components_two_phase,
    dedup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_cc_two_components_and_chain(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 10-11
    cc = connected_components(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    )
    got = {(r["node"], r["component"]) for r in cc.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_cc_direction_and_duplicates_ignored(spark):
    # reversed edges and duplicate edges collapse to the same components
    cc = connected_components(
        _edges(spark, [(5, 2), (2, 5), (2, 9), (2, 9), (9, 2)])
    )
    got = {(r["node"], r["component"]) for r in cc.collect()}
    assert got == {(2, 2), (5, 2), (9, 2)}


def test_cc_star_converges_one_round(spark):
    cc = connected_components(
        _edges(spark, [(7, 100), (7, 101), (7, 102)]), max_iter=3
    )
    assert {r["component"] for r in cc.collect()} == {7}


def test_dedup_clusters_canonical_and_sizes(spark):
    out = dedup_clusters(
        _edges(spark, [(3, 1), (1, 2), (8, 9)]), "src", "dst"
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[1]["is_canonical"] and rows[8]["is_canonical"]
    assert not rows[2]["is_canonical"] and not rows[9]["is_canonical"]
    assert rows[2]["cluster_size"] == 3 and rows[9]["cluster_size"] == 2
    assert rows[3]["cluster_id"] == 1 and rows[9]["cluster_id"] == 8


def test_pagerank_center_outranks_leaves(spark):
    """Star graph: the hub collects every leaf's full contribution, so
    its rank must exceed the leaves'; leaves are symmetric → equal."""
    from m5_competition_kaggle_spark.operators.graph import pagerank_int

    star = [(0, i) for i in range(1, 6)]
    out = {
        r["node"]: r["rank"]
        for r in pagerank_int(
            _edges(spark, star), "src", "dst", iterations=3
        ).collect()
    }
    assert out[0] > out[1]
    assert len({out[i] for i in range(1, 6)}) == 1
    # hand-rolled recurrence twin (same int64 truncation rules)
    ranks = {n: 1_000_000 for n in range(6)}
    deg = {0: 5, **{i: 1 for i in range(1, 6)}}
    for _ in range(3):
        contrib = {n: 0 for n in ranks}
        for a, b in star:
            contrib[b] += ranks[a] // deg[a]
            contrib[a] += ranks[b] // deg[b]
        ranks = {
            n: 150_000 + (85 * contrib[n]) // 100 for n in ranks
        }
    assert out == ranks


# ---------------------------------------------------------------- properties

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _union_find_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize: component id = min node id reachable
    return {n: find(n) for n in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
def test_cc_matches_union_find(spark, pairs):
    """∀ random graphs: distributed min-label propagation == driver-side
    union-find with path compression."""
    got = {
        (r["node"], r["component"])
        for r in connected_components(
            _edges(spark, pairs), max_iter=40
        ).collect()
    }
    ref = _union_find_components(pairs)
    assert got == set(ref.items())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
def test_cc_two_phase_matches_union_find(spark, pairs):
    """∀ random graphs: large-star/small-star == driver-side union-find
    (and hence == the propagation variant)."""
    got = {
        (r["node"], r["component"])
        for r in connected_components_two_phase(
            _edges(spark, pairs), max_iter=40
        ).collect()
    }
    ref = _union_find_components(pairs)
    assert got == set(ref.items())


def test_cc_two_phase_long_chain_logarithmic_rounds(spark):
    """The adversarial case the variant exists for: a 33-node path has
    diameter 32 (propagation needs ~diameter rounds); two-phase must
    finish in O(log² d) — single digits — and still be exact."""
    chain = [(i, i + 1) for i in range(32)]
    stats = {}
    cc = connected_components_two_phase(
        _edges(spark, chain), max_iter=40, stats=stats
    )
    got = {(r["node"], r["component"]) for r in cc.collect()}
    assert got == {(i, 0) for i in range(33)}
    assert stats["rounds"] <= 8, stats


def test_cc_two_phase_unconverged_raises(spark):
    """Exhausting max_iter without a fixpoint must raise, not silently
    return a non-forest edge set with conflicting labels (r3 advice,
    graph.py fixpoint check)."""
    import pytest

    chain = [(i, i + 1) for i in range(32)]
    with pytest.raises(RuntimeError, match="star forest"):
        connected_components_two_phase(
            _edges(spark, chain), max_iter=1
        ).collect()
