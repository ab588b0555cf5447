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


# ------------------------------------------------------------ ndcg


def _ndcg(spark, ranked, relevant, k=3):
    from m5_competition_kaggle_spark.operators.ranking_eval import (
        ndcg_at_k,
    )

    r = spark.createDataFrame(
        ranked, "query_id long, neighbor_id long, rank int"
    )
    rel = spark.createDataFrame(
        relevant, "query_id long, neighbor_id long, exact_rank int"
    )
    return {
        row.query_id: row
        for row in ndcg_at_k(r, rel, k).collect()
    }


def test_ndcg_perfect_ranking_is_one(spark):
    ranked = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    rel = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    r = _ndcg(spark, ranked, rel)[1]
    assert (r.n_rel, r.n_hit) == (3, 3)
    assert r.ndcg_ppm == 1_000_000


def test_ndcg_penalizes_late_hits(spark):
    # single relevant item (gain 3) retrieved at rank 3:
    # dcg = 3/log2(4) = 1.5, idcg = 3 -> 500000
    ranked = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    rel = [(1, 12, 1)]
    r = _ndcg(spark, ranked, rel)[1]
    assert r.n_hit == 1
    assert r.ndcg_ppm == 500_000


def test_ndcg_missing_top_costs_more_than_missing_tail(spark):
    # query 1 retrieves exact #1,#2 (misses #3);
    # query 2 retrieves exact #2,#3 (misses #1)
    ranked = [(1, 10, 1), (1, 11, 2), (2, 11, 1), (2, 12, 2)]
    rel = [
        (q, nid, er)
        for q in (1, 2)
        for nid, er in ((10, 1), (11, 2), (12, 3))
    ]
    out = _ndcg(spark, ranked, rel)
    assert out[1].n_hit == out[2].n_hit == 2
    assert out[1].ndcg_ppm > out[2].ndcg_ppm


def test_ndcg_all_miss_is_zero(spark):
    ranked = [(1, 10, 1), (1, 11, 2)]
    rel = [(1, 99, 1)]
    r = _ndcg(spark, ranked, rel)[1]
    assert (r.n_rel, r.n_hit) == (1, 0)
    assert r.ndcg_ppm == 0 and r.dcg == 0.0


def test_ndcg_constants_roundtrip():
    import math

    from m5_competition_kaggle_spark.operators.ranking_eval import (
        discounts,
        ideal_dcg_ladder,
    )

    d = discounts(10)
    for i, v in enumerate(d, start=1):
        assert v == 1.0 / math.log2(i + 1)
        assert float(repr(v)) == v  # repr round-trips bit-exact
    lad = ideal_dcg_ladder(10)
    assert lad[0] == 10.0  # one relevant item: gain 10 at rank 1
    assert all(float(repr(v)) == v for v in lad)
    assert all(b > a for a, b in zip(lad, lad[1:]))


# ------------------------------------------------------------- hhi


def _hhi(spark, rows):
    from m5_competition_kaggle_spark.operators.concentration import (
        group_hhi,
    )

    df = spark.createDataFrame(rows, "u long, cls string")
    return {r.u: r for r in group_hhi(df, "u", "cls").collect()}


def test_hhi_uniform_vs_monoculture(spark):
    rows = [(1, c) for c in "abcd"] + [(2, "a")] * 4
    out = _hhi(spark, rows)
    # 4 classes of 1: HHI = 4/16 = 250 permille; dominance tie -> 'a'
    assert out[1].hhi_permille == 250
    assert (out[1].dom_class, out[1].dom_permille) == ("a", 250)
    # monoculture: HHI = 1000, dominant share 1000
    assert out[2].hhi_permille == 1000
    assert (out[2].dom_class, out[2].dom_permille) == ("a", 1000)
    assert out[2].n_classes == 1


def test_hhi_dominant_tie_breaks_on_class(spark):
    rows = [(1, "b"), (1, "b"), (1, "a"), (1, "a"), (1, "c")]
    out = _hhi(spark, rows)[1]
    # a and b tie at 2; 'a' wins by name
    assert out.dom_class == "a"
    assert out.dom_permille == 400
    assert out.hhi_permille == (1000 * (4 + 4 + 1)) // 25


# ------------------------------------------------------------ lift


def _lift(spark, rows, b=2):
    from m5_competition_kaggle_spark.operators.gains import (
        lift_table,
    )

    df = spark.createDataFrame(
        rows, "id long, score long, positive int"
    )
    return {
        r.bucket: r
        for r in lift_table(df, "score", "positive", "id", b)
        .collect()
    }


def test_lift_perfect_ranking(spark):
    # 4 rows, 2 positives with the top scores: top half captures all
    rows = [(1, 100, 1), (2, 90, 1), (3, 10, 0), (4, 5, 0)]
    out = _lift(spark, rows)
    assert (out[1].cum_pos, out[1].capture_permille) == (2, 1000)
    assert out[1].lift_permille == 2000  # 2x over random
    assert out[2].lift_permille == 1000  # full corpus = baseline
    assert out[2].capture_permille == 1000


def test_lift_random_ranking_is_flat(spark):
    # positives spread evenly: every prefix sits at baseline
    rows = [(1, 40, 1), (2, 30, 0), (3, 20, 1), (4, 10, 0)]
    out = _lift(spark, rows)
    assert out[1].lift_permille == 1000
    assert out[2].lift_permille == 1000


def test_lift_no_positives_is_null(spark):
    rows = [(1, 2, 0), (2, 1, 0)]
    out = _lift(spark, rows)
    assert out[1].lift_permille is None
    assert out[1].capture_permille is None


def test_lift_bucket_validation(spark):
    import pytest as _pytest

    from m5_competition_kaggle_spark.operators.gains import (
        lift_table,
    )

    with _pytest.raises(ValueError):
        lift_table(None, "s", "p", "id", 0)


# ------------------------------------------------- weighted quantile


def _wq(spark, rows, qs=((1, 2),)):
    from m5_competition_kaggle_spark.operators.weighted_quantile import (
        weighted_quantiles,
    )

    df = spark.createDataFrame(rows, "g string, v long, w long")
    return {
        r.g: r
        for r in weighted_quantiles(
            df, ["g"], "v", "w", qs
        ).collect()
    }


def test_weighted_median_hand_computed(spark):
    # masses: 1@1, 1@2, 10@3 -> half of 12 is 6, reached at v=3
    out = _wq(spark, [("g", 1, 1), ("g", 2, 1), ("g", 3, 10)])
    assert out["g"].wq_1_2 == 3
    assert out["g"].w_total == 12 and out["g"].n == 3


def test_weighted_median_equal_weights_matches_unweighted(spark):
    rows = [("g", v, 1) for v in (10, 20, 30, 40, 50)]
    out = _wq(spark, rows)
    assert out["g"].wq_1_2 == 30


def test_weighted_quantile_tie_values_collapse(spark):
    # duplicate values must pool their mass before the walk
    rows = [("g", 5, 1), ("g", 5, 1), ("g", 5, 1), ("g", 9, 2)]
    out = _wq(spark, rows, qs=((1, 2), (4, 5)))
    assert out["g"].wq_1_2 == 5   # 3 of 5 mass at 5
    assert out["g"].wq_4_5 == 9   # 4/5 of mass needs v=9


def test_weighted_quantile_validation(spark):
    import pytest as _pytest

    from m5_competition_kaggle_spark.operators.weighted_quantile import (
        weighted_quantiles,
    )

    with _pytest.raises(ValueError):
        weighted_quantiles(None, ["g"], "v", "w", [(0, 4)])
    with _pytest.raises(ValueError):
        weighted_quantiles(None, ["g"], "v", "w", [(5, 4)])


# ------------------------------------------------------------ holt


def _holt(spark, rows, **kw):
    from m5_competition_kaggle_spark.operators.holt import (
        holt_level_trend,
    )

    df = spark.createDataFrame(rows, "k string, t long, v long")
    return {
        r.k: r
        for r in holt_level_trend(df, "k", "t", "v", **kw).collect()
    }


def test_holt_hand_computed(spark):
    # y = [100, 108]: e = 8 -> l = 100+0+2 = 102, b = 0+1 = 1
    out = _holt(spark, [("k", 1, 100), ("k", 2, 108)])["k"]
    assert (out.level, out.trend, out.forecast_next) == (102, 1, 103)
    assert out.n_points == 2


def test_holt_follows_linear_ramp(spark):
    # perfectly linear series: trend converges toward the slope and
    # the forecast tracks within the smoothing lag
    rows = [("k", t, 1000 + 50 * t) for t in range(1, 31)]
    out = _holt(spark, rows)["k"]
    assert 25 <= out.trend <= 50
    actual_next = 1000 + 50 * 31
    assert abs(out.forecast_next - actual_next) < 400


def test_holt_constant_series_is_fixed_point(spark):
    rows = [("k", t, 777) for t in range(1, 20)]
    out = _holt(spark, rows)["k"]
    assert (out.level, out.trend, out.forecast_next) == (777, 0, 777)


def test_holt_singleton_and_order_insensitivity(spark):
    out = _holt(spark, [("s", 5, 42)])["s"]
    assert (out.level, out.trend, out.forecast_next) == (42, 0, 42)
    # shuffled input must fold in t order
    a = _holt(spark, [("k", 2, 10), ("k", 1, 100), ("k", 3, 20)])
    b = _holt(spark, [("k", 1, 100), ("k", 2, 10), ("k", 3, 20)])
    assert a["k"] == b["k"]


def test_holt_validation(spark):
    import pytest as _pytest

    from m5_competition_kaggle_spark.operators.holt import (
        holt_level_trend,
    )

    with _pytest.raises(ValueError):
        holt_level_trend(None, "k", "t", "v", alpha_den=0)


# ---------------------------------------------------------- funnel


def _funnel(spark, rows, steps=("a", "b", "c")):
    from m5_competition_kaggle_spark.operators.funnel import (
        funnel_reach,
    )

    df = spark.createDataFrame(rows, "u long, t string, ts long")
    return {
        r.entity: r
        for r in funnel_reach(
            df, "u", "t", "ts", list(steps)
        ).collect()
    }


def test_funnel_strict_order(spark):
    # user 1 completes in order; user 2's c precedes b -> chain stops
    rows = [(1, "a", 10), (1, "b", 20), (1, "c", 30),
            (2, "a", 10), (2, "c", 15), (2, "b", 20)]
    out = _funnel(spark, rows)
    assert (out[1].t_1, out[1].t_2, out[1].t_3) == (10, 20, 30)
    assert (out[2].t_1, out[2].t_2) == (10, 20)
    assert out[2].t_3 is None


def test_funnel_equal_ts_does_not_count(spark):
    # strictly-after: b at the same instant as a does not qualify
    rows = [(1, "a", 10), (1, "b", 10), (1, "b", 11)]
    out = _funnel(spark, rows)
    assert (out[1].t_1, out[1].t_2) == (10, 11)


def test_funnel_never_started(spark):
    rows = [(1, "b", 5), (1, "c", 6)]
    out = _funnel(spark, rows)
    assert out[1].t_1 is None and out[1].t_2 is None


def test_funnel_picks_first_qualifying(spark):
    rows = [(1, "a", 50), (1, "a", 10), (1, "b", 20), (1, "b", 90)]
    out = _funnel(spark, rows)
    # earliest a = 10; earliest b after it = 20 (not 90)
    assert (out[1].t_1, out[1].t_2) == (10, 20)


def test_funnel_conversion_rollup(spark):
    from m5_competition_kaggle_spark.operators.funnel import (
        funnel_conversion,
        funnel_reach,
    )

    rows = [(1, "a", 1), (1, "b", 2), (1, "c", 3),
            (2, "a", 1), (2, "b", 2),
            (3, "a", 1),
            (4, "b", 1)]
    df = spark.createDataFrame(rows, "u long, t string, ts long")
    reach = funnel_reach(df, "u", "t", "ts", ["a", "b", "c"])
    from pyspark.sql import functions as F

    out = funnel_conversion(
        reach.withColumn("g", F.lit("all")), "g", 3
    ).collect()[0]
    assert (out.n_entities, out.reached_1) == (4, 3)
    assert (out.reached_2, out.reached_3) == (2, 1)
    assert out.conv_2_permille == 666
    assert out.conv_3_permille == 333


def test_funnel_validation(spark):
    import pytest as _pytest

    from m5_competition_kaggle_spark.operators.funnel import (
        funnel_reach,
    )

    with _pytest.raises(ValueError):
        funnel_reach(None, "u", "t", "ts", ["only_one"])


def test_funnel_max_gap_bounds_each_step(spark):
    from m5_competition_kaggle_spark.operators.funnel import (
        funnel_reach,
    )

    # b at +5 within gap 10; c at +30 exceeds it -> chain stops at b
    rows = [(1, "a", 100), (1, "b", 105), (1, "c", 135),
            (2, "a", 100), (2, "b", 150)]
    df = spark.createDataFrame(rows, "u long, t string, ts long")
    out = {
        r.entity: r
        for r in funnel_reach(
            df, "u", "t", "ts", ["a", "b", "c"], max_gap=10
        ).collect()
    }
    assert (out[1].t_1, out[1].t_2, out[1].t_3) == (100, 105, None)
    assert out[2].t_2 is None  # b outside the gap

    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel_reach(df, "u", "t", "ts", ["a", "b"], max_gap=0)


# ------------------------------------------------------ ivf health


def test_ivf_health_hand_computed(spark):
    from m5_competition_kaggle_spark.operators.ivf_health import (
        ivf_health,
    )

    # centroids = vecs 0 ([1,0]) and 1 ([0,1]); vec 2 -> c0, 3 -> c1
    vecs = [(0, [1.0, 0.0]), (1, [0.0, 1.0]),
            (2, [0.9, 0.1]), (3, [0.1, 0.9])]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    )
    out = {r.cid: r for r in ivf_health(df, 2).collect()}
    assert out[0].n_assigned == 2 and out[1].n_assigned == 2
    assert out[0].share_permille == 500
    # c0 members: self (dot 1e6) + vec2 (dot 900*1000 = 900000)
    assert out[0].sum_dot == 1_000_000 + 900_000
    assert out[0].mean_dot_q == 950_000


def test_ivf_health_shares_partition_the_corpus(spark):
    from m5_competition_kaggle_spark.operators.ivf_health import (
        ivf_health,
    )
    from m5_competition_kaggle_spark.sources.catalog import (
        load_table,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = ivf_health(emb, 16).collect()
    n = emb.count()
    assert sum(r.n_assigned for r in rows) == n  # exact partition
    # floor-permille shares sum to <= 1000 and within 16 of it
    total = sum(r.share_permille for r in rows)
    assert 1000 - 16 <= total <= 1000


# ------------------------------------------------------------ rmsse


def _rmsse(spark, rows):
    from m5_competition_kaggle_spark.operators.rmsse import rmsse

    df = spark.createDataFrame(
        rows, "s string, t long, y long, yhat long"
    )
    return {
        r.s: r for r in rmsse(df, ["s"], "t", "y", "yhat").collect()
    }


def test_rmsse_perfect_forecast_is_zero(spark):
    rows = [("a", t, 10 * t, 10 * t) for t in range(1, 6)]
    out = _rmsse(spark, rows)["a"]
    assert out.sse == 0 and out.rmsse_ppm == 0


def test_rmsse_naive_equivalent_is_one(spark):
    # yhat = previous value == the naive scale itself -> RMSSE = 1
    ys = [3, 7, 4, 9, 5]
    rows = [
        ("a", t, y, ys[t - 2] if t >= 2 else None)
        for t, y in enumerate(ys, start=1)
    ]
    out = _rmsse(spark, rows)["a"]
    # warm-up row excluded from errors; same pairs in both sums
    assert out.n_scored == out.n_scale == 4
    assert out.sse == out.scale_sse
    assert out.rmsse_ppm == 1_000_000


def test_rmsse_hand_computed(spark):
    # y: 0,2 ; yhat: 0,0 -> sse=4 over n=2; scale: (2-0)^2=4 over 1
    # rmsse = sqrt((4/2)/(4/1)) = sqrt(0.5)
    import math

    rows = [("a", 1, 0, 0), ("a", 2, 2, 0)]
    out = _rmsse(spark, rows)["a"]
    assert out.rmsse_ppm == round(1e6 * math.sqrt(0.5))


def test_rmsse_constant_series_null(spark):
    rows = [("a", t, 5, 4) for t in range(1, 5)]
    out = _rmsse(spark, rows)["a"]
    assert out.scale_sse == 0 and out.rmsse_ppm is None


def test_ndcg_index_returning_nothing_scores_zero(spark):
    # query 2 has a relevance set but the index returned NO rows:
    # it must surface with ndcg 0, not vanish from the table
    ranked = [(1, 10, 1)]
    rel = [(1, 10, 1), (2, 10, 1)]
    out = _ndcg(spark, ranked, rel)
    assert out[1].ndcg_ppm == 1_000_000
    assert (out[2].n_rel, out[2].n_hit) == (1, 0)
    assert out[2].ndcg_ppm == 0 and out[2].dcg == 0.0
