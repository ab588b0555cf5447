"""Unit tests for the third round-7 batch (merge, graph_lpa, and the
systematic-sampling query invariants)."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.graph_lpa import (
    label_propagation,
)
from m5_competition_kaggle_spark.operators.merge import (
    ACTION_COL,
    merge_upsert,
)


def test_merge_upsert_actions_and_values(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, st string, pm long",
    )
    changes = spark.createDataFrame(
        [(2, "U", "B", 99), (3, "D", "", 0), (4, "U", "d", 40)],
        "k long, op string, st string, pm long",
    )
    out = {
        r.k: r for r in merge_upsert(snap, changes, "k", ["st", "pm"]).collect()
    }
    assert out[1][ACTION_COL] == "unchanged" and (out[1].st, out[1].pm) == ("a", 10)
    assert out[2][ACTION_COL] == "update" and (out[2].st, out[2].pm) == ("B", 99)
    # delete rows retained, carrying the SNAPSHOT values
    assert out[3][ACTION_COL] == "delete" and (out[3].st, out[3].pm) == ("c", 30)
    assert out[4][ACTION_COL] == "insert" and (out[4].st, out[4].pm) == ("d", 40)


def test_label_propagation_clamps_and_ties(spark):
    # seed 1 with label 9; line graph 1-2-3; one round labels node 2
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    seeds = spark.createDataFrame([(1, 9)], "node long, label long")
    r1 = {
        r.node: r.label
        for r in label_propagation(pairs, seeds, rounds=1).collect()
    }
    assert r1 == {1: 9, 2: 9}  # 3 not reached yet
    r2 = {
        r.node: r.label
        for r in label_propagation(pairs, seeds, rounds=2).collect()
    }
    assert r2 == {1: 9, 2: 9, 3: 9}
    # tie: node 3 between labels 1 and 2 (one neighbor each) → min label
    pairs2 = spark.createDataFrame(
        [(1, 3), (2, 3)], "id_a long, id_b long"
    )
    seeds2 = spark.createDataFrame(
        [(1, 2), (2, 1)], "node long, label long"
    )
    out = {
        r.node: r.label
        for r in label_propagation(pairs2, seeds2, rounds=1).collect()
    }
    assert out[3] == 1  # tie broken toward the smaller label
    # seeds clamp: node 1 keeps its seed label even if neighbors disagree
    assert out[1] == 2 and out[2] == 1


def test_systematic_sample_exactly_k_and_weight_bias(spark):
    from m5_competition_kaggle_spark.queries.extensions_r7c import (
        x104_systematic_sample,
    )

    out = x104_systematic_sample(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 100  # exactly k selections
    assert [r.point_idx for r in out] == list(range(100))
    # PPS property: selection count per doc is within 1 of w·k/W
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tw = docs.agg(F.sum("n_chars")).collect()[0][0]
    from collections import Counter

    picks = Counter(r.doc_id for r in out)
    weights = {r.doc_id: r.n_chars for r in docs.collect()}
    for doc, cnt in picks.items():
        expect = weights[doc] * 100 / tw
        assert abs(cnt - expect) <= 1
