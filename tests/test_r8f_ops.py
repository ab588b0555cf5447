"""Unit tests for integer power-iteration PCA (operators/pca_power)."""

from __future__ import annotations

import pytest


def _run(spark, vecs, rounds=3):
    from m5_competition_kaggle_spark.operators.pca_power import (
        gram_matrix,
        power_iteration,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    gram = gram_matrix(df, "embedding")
    return gram, power_iteration(gram, rounds=rounds)


def test_gram_exact_integers(spark):
    gram, _ = _run(spark, [[1.0, 0.0], [1.0, 0.0], [0.0, 2.0]])
    g = {(r.i, r.j): r.g for r in gram.collect()}
    # q rows: (1000,0) x2, (0,2000)
    assert g == {
        (0, 0): 2_000_000, (0, 1): 0,
        (1, 0): 0, (1, 1): 4_000_000,
    }


def test_power_iteration_hand_computed(spark):
    _, out = _run(spark, [[1.0, 0.0], [1.0, 0.0], [0.0, 2.0]])
    rows = {r.i: r for r in out.collect()}
    # diagonal G = diag(2e6, 4e6) from ones:
    # r1=[2e6,4e6] -> n1=[499,999]; r2=[998e6,3.996e9] ->
    # n2=[249,999]; r3=[498e6,3.996e9]
    assert rows[1].v_raw == 3_996_000_000
    assert rows[0].v_raw == 498_000_000
    assert rows[1].v_permille == 1000
    assert rows[0].v_permille == 124


def test_power_iteration_finds_dominant_direction(spark):
    import numpy as np

    rng = [
        [float(0.9 + 0.01 * (i % 5)), float(0.1 * ((i % 3) - 1))]
        for i in range(40)
    ]
    _, out = _run(spark, rng)
    rows = {r.i: r for r in out.collect()}
    # variance concentrates on dim 0: permille loading of dim 1 is
    # small relative to the dominant dim
    assert rows[0].v_permille == 1000
    assert abs(rows[1].v_permille) < 200
    # cross-check direction against numpy's eigendecomposition
    q = np.round(np.array(rng) * 1000).astype(np.int64)
    g = q.T @ q
    w, v = np.linalg.eigh(g.astype(float))
    top = v[:, np.argmax(w)]
    top = top / np.abs(top).max() * 1000
    assert abs(abs(top[1]) - abs(rows[1].v_permille)) < 30


def test_power_iteration_rounds_validation(spark):
    from m5_competition_kaggle_spark.operators.pca_power import (
        power_iteration,
    )

    with pytest.raises(ValueError):
        power_iteration(None, rounds=0)
