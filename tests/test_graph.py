"""Semantic tests for connected-components dedup clustering: planted
graphs with known components; the cross-engine contract is pinned by the
x24 DuckDB recursive-CTE oracle (scripts/check_oracle.py)."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.graph import (
    connected_components,
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
