"""Croston (operators/croston.py) and scaled pinball loss
(operators/pinball.py) — hand-walked recurrences and contract edges
the sf fixtures don't exercise (singleton series, constant train,
empty eval keys)."""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.croston import (
    croston_forecast,
)
from m5_competition_kaggle_spark.operators.pinball import (
    scaled_pinball_loss,
)


def _croston(spark, rows):
    df = spark.createDataFrame(rows, "k string, t bigint, q bigint")
    return {
        r["k"]: r
        for r in croston_forecast(df, "k", "t", "q").collect()
    }


def test_croston_hand_walked(spark):
    # demands q at days t: (0,8), (10,16), (12,4), (20,12); alpha=1/4
    # z: 8 -> 8+(16-8)//4=10 -> 10+(4-10)//4=9 (trunc toward 0: -6//4=-1)
    #      -> 9+(12-9)//4=9
    # p: -1 -> first interval 10 -> 10+((2)-10)//4=8 -> 8+((8)-8)//4=8
    out = _croston(
        spark,
        [("a", 0, 8), ("a", 10, 16), ("a", 12, 4), ("a", 20, 12)],
    )["a"]
    assert out["n_demands"] == 4
    assert out["size_level"] == 9
    assert out["interval_level"] == 8
    assert out["forecast_ppm"] == 1_000_000 * 9 // 8


def test_croston_singleton_and_order_independence(spark):
    rows = [("s", 5, 7), ("b", 3, 2), ("b", 9, 4)]
    out = _croston(spark, rows)
    assert out["s"]["size_level"] == 7
    assert out["s"]["interval_level"] is None
    assert out["s"]["forecast_ppm"] is None
    assert out["b"]["interval_level"] == 6  # single interval = init
    # input row order must not matter (sort_array supplies the order)
    out2 = _croston(spark, list(reversed(rows)))
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in out2.items()
    }


def test_croston_rejects_bad_alpha(spark):
    df = spark.createDataFrame([("a", 1, 1)], "k string, t long, q long")
    with pytest.raises(ValueError):
        croston_forecast(df, "k", "t", "q", alpha_den=0)


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, t bigint, y bigint")


def test_pinball_hand_walked(spark):
    # key a: train t=1..4 y=[10,20,30,40], eval t=5..6 y=[25, 50]
    # horizon=2 -> cut = 6-2 = 4.
    # u=500: k=ceil(.5*4)=2 -> fcst=20; pin: y=25 -> 500*5=2500,
    #   y=50 -> 500*30=15000; sum=17500. D=30, N=3.
    # spl_ppm = 1000*17500*3 // (2*30) = 875000
    rows = [("a", t, y) for t, y in
            [(1, 10), (2, 20), (3, 30), (4, 40), (5, 25), (6, 50)]]
    out = {
        (r["k"], r["u"]): r
        for r in scaled_pinball_loss(
            spark, _series(spark, rows), "k", "t", "y",
            horizon=2, levels_permille=(500, 900),
        ).collect()
    }
    r = out[("a", 500)]
    assert (r["n_train"], r["n_eval"], r["fcst"]) == (4, 2, 20)
    assert r["pin_sum"] == 17500
    assert (r["scale_num"], r["n_diff"]) == (30, 3)
    assert r["spl_ppm"] == 1000 * 17500 * 3 // (2 * 30)
    # u=900: k=ceil(3.6)=4 -> fcst=40; pin: 100*15 + 900*10 = 10500
    assert out[("a", 900)]["fcst"] == 40
    assert out[("a", 900)]["pin_sum"] == 100 * 15 + 900 * 10


def test_pinball_constant_train_and_missing_eval(spark):
    # key c: constant train -> scale_num = 0 -> spl_ppm NULL;
    # key d: train only (no rows past the global cut) -> drops
    rows = [("c", t, 5) for t in range(1, 7)] + [
        ("d", 1, 3), ("d", 2, 9)
    ]
    out = scaled_pinball_loss(
        spark, _series(spark, rows), "k", "t", "y",
        horizon=2, levels_permille=(500,),
    ).collect()
    keys = {r["k"] for r in out}
    assert keys == {"c"}
    assert out[0]["spl_ppm"] is None
    assert out[0]["pin_sum"] == 0  # |5-5| pinball


def test_pinball_validates_args(spark):
    df = _series(spark, [("a", 1, 1)])
    with pytest.raises(ValueError):
        scaled_pinball_loss(spark, df, "k", "t", "y", horizon=0)
    with pytest.raises(ValueError):
        scaled_pinball_loss(
            spark, df, "k", "t", "y", horizon=1,
            levels_permille=(0,),
        )
