"""Property/unit tests for the r8d operators: linear interpolation,
quantile normalization, Kaplan-Meier survival, MMR re-rank."""

from __future__ import annotations

import pytest


# ---------------------------------------------------- interpolation


def _interp(spark, rows):
    from m5_competition_kaggle_spark.operators.interpolate import (
        linear_interpolate,
    )

    df = spark.createDataFrame(
        rows, "g string, t long, y long, m boolean"
    )
    return {
        (r.g, r.t): r
        for r in linear_interpolate(
            df, ["g"], "t", "y", "m"
        ).collect()
    }


def test_interp_exact_midpoint(spark):
    out = _interp(
        spark,
        [("a", 0, 10, False), ("a", 1, 999, True),
         ("a", 2, 30, False)],
    )
    r = out[("a", 1)]
    assert (r.t_prev, r.y_prev, r.t_next, r.y_next) == (0, 10, 2, 30)
    assert (r.interp_num, r.interp_den, r.interp_q) == (40, 2, 20)


def test_interp_uneven_gap_floor_quotient(spark):
    # prev (0, 0), next (3, 10): t=1 -> 10/3 -> floor 3
    out = _interp(
        spark,
        [("a", 0, 0, False), ("a", 1, -1, True),
         ("a", 3, 10, False)],
    )
    r = out[("a", 1)]
    assert (r.interp_num, r.interp_den, r.interp_q) == (10, 3, 3)


def test_interp_edges_and_unmasked_null(spark):
    out = _interp(
        spark,
        [("a", 0, 5, True), ("a", 1, 7, False),
         ("a", 2, 9, True)],
    )
    # masked at both edges: missing a flank -> NULL
    assert out[("a", 0)].interp_q is None
    assert out[("a", 2)].interp_q is None
    # unmasked row: NULL interp columns
    assert out[("a", 1)].interp_q is None


def test_interp_skips_masked_neighbors(spark):
    # two adjacent masked points interpolate from the same flanks
    out = _interp(
        spark,
        [("a", 0, 0, False), ("a", 1, -1, True),
         ("a", 2, -1, True), ("a", 3, 30, False)],
    )
    assert (out[("a", 1)].interp_q, out[("a", 2)].interp_q) == (
        10, 20)
    assert out[("a", 1)].t_next == 3
    assert out[("a", 2)].t_prev == 0


# ----------------------------------------------- quantile normalize


def test_quantile_normalize_maps_extremes_and_median(spark):
    from m5_competition_kaggle_spark.operators.quantile_norm import (
        quantile_normalize,
    )

    rows = [("s1", 10, 1), ("s1", 20, 2), ("s1", 30, 3),
            ("s2", 100, 4), ("s2", 200, 5), ("lone", 7, 6)]
    df = spark.createDataFrame(rows, "src string, v long, id long")
    out = {r.id: r for r in
           quantile_normalize(df, "src", "v", "id").collect()}
    # global order by (v, id): 7,10,20,30,100,200 -> N=6
    # s1 ranks 1..3 of 3 map to pos 1, 1+(1*5)//2=3, 6
    assert out[1].norm_value == 7
    assert out[2].norm_value == 20
    assert out[3].norm_value == 200
    # s2 rank 1/2 -> pos 1, 6
    assert out[4].norm_value == 7
    assert out[5].norm_value == 200
    # singleton source -> global median position 1+(5//2)=3
    assert out[6].mapped_pos == 3
    assert out[6].norm_value == 20


def test_quantile_normalize_identity_on_single_source(spark):
    from m5_competition_kaggle_spark.operators.quantile_norm import (
        quantile_normalize,
    )

    rows = [("s", v, v) for v in range(1, 8)]
    df = spark.createDataFrame(rows, "src string, v long, id long")
    out = quantile_normalize(df, "src", "v", "id").collect()
    # one source spanning the whole corpus maps onto itself
    assert all(r.norm_value == r.v for r in out)


# ------------------------------------------------------------- km


def _km(spark, rows):
    from m5_competition_kaggle_spark.operators.survival import (
        km_curve,
    )

    df = spark.createDataFrame(rows, "duration long, event int")
    return {r.t: r for r in km_curve(df).collect()}


def test_km_hand_computed(spark):
    # deaths at 1 (n=4) and 3 (n=2), censor at 2
    out = _km(spark, [(1, 1), (2, 0), (3, 1), (3, 0)])
    assert out[1].n_risk == 4 and out[1].d == 1
    assert out[1].surv_ppm == 750_000
    # S(3) = 3/4 * 1/2 = 0.375; censored-at-3 still at risk at 3
    assert out[3].n_risk == 2 and out[3].d == 1
    assert out[3].surv_ppm == 375_000
    # censoring-only time emits no row
    assert 2 not in out


def test_km_all_deaths_reaches_zero(spark):
    out = _km(spark, [(1, 1), (2, 1), (2, 1)])
    assert out[2].surv_ppm == 0
    assert out[1].surv_ppm == pytest.approx(666_667, abs=1)


def test_km_no_deaths_is_empty(spark):
    assert _km(spark, [(5, 0), (9, 0)]) == {}


# ------------------------------------------------------------ mmr


def _mmr(spark, shortlist, vecs, **kw):
    from m5_competition_kaggle_spark.operators.mmr import mmr_rerank

    sl = spark.createDataFrame(
        shortlist, "query_id long, neighbor_id long, dot long"
    )
    vv = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    return mmr_rerank(sl, vv, **kw).orderBy("mmr_rank").collect()


def test_mmr_penalizes_redundancy(spark):
    # n1/n2 identical vectors (sim high), n3 orthogonal: after
    # picking n1, MMR must prefer n3 over the duplicate n2 even
    # though n2's relevance is higher.
    vecs = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    short = [(9, 1, 1000), (9, 2, 999), (9, 3, 500)]
    out = _mmr(spark, short, vecs, k=3)
    assert [r.neighbor_id for r in out] == [1, 3, 2]
    # round 1: max_sim 0, mmr2 = rel
    assert (out[0].max_sim, out[0].mmr2) == (0, 1000)
    # round 2: n3 vs selected n1 -> sim 0 -> mmr2 = 500
    assert (out[1].max_sim, out[1].mmr2) == (0, 500)
    # round 3: n2 sim to n1 = 1e6 -> mmr2 = 999 - 1000000
    assert (out[2].max_sim, out[2].mmr2) == (1_000_000, -999_001)


def test_mmr_ties_break_on_id_and_short_groups_truncate(spark):
    vecs = [(1, [1.0, 0.0]), (2, [1.0, 0.0])]
    short = [(9, 2, 100), (9, 1, 100)]
    out = _mmr(spark, short, vecs, k=5)
    # k=5 but only 2 candidates; tie on rel -> lower id first
    assert [r.neighbor_id for r in out] == [1, 2]
    assert len(out) == 2


def test_mmr_lambda_validation(spark):
    from m5_competition_kaggle_spark.operators.mmr import mmr_rerank

    with pytest.raises(ValueError):
        mmr_rerank(None, None, lam_num=3, lam_den=2)
    with pytest.raises(ValueError):
        mmr_rerank(None, None, lam_num=0, lam_den=2)
