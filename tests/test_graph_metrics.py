"""Triangle counting (operators/graph_metrics.py)."""

from m5_competition_kaggle_spark.operators.graph_metrics import (
    triangle_counts,
)


def _count(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}


def test_clique_formula(spark):
    """Every node of a k-clique sits on C(k-1, 2) triangles."""
    k = 7
    edges = [(a, b) for a in range(k) for b in range(a + 1, k)]
    got = _count(spark, edges)
    expect = (k - 1) * (k - 2) // 2
    assert got == {n: expect for n in range(k)}


def test_path_and_star_have_no_triangles(spark):
    path = [(i, i + 1) for i in range(6)]
    star = [(0, i) for i in range(1, 7)]
    assert _count(spark, path) == {}
    assert _count(spark, star) == {}


def test_normalizes_duplicates_reversals_loops(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    messy = tri + [(2, 1), (3, 2), (1, 2), (4, 4)]
    assert _count(spark, messy) == _count(spark, tri) == {1: 1, 2: 1, 3: 1}


def test_two_triangles_sharing_an_edge(spark):
    edges = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)]
    assert _count(spark, edges) == {1: 2, 2: 2, 3: 1, 4: 1}


def test_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert triangle_counts(df).count() == 0
