"""Unit tests for the second round-6 operator batch (robust, anomaly,
fusion, centroid) on hand-checked inputs."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.anomaly import (
    rolling_zscore_flags,
)
from m5_competition_kaggle_spark.operators.centroid import (
    centroid_confusion,
    centroid_sums,
)
from m5_competition_kaggle_spark.operators.fusion import rrf_fuse
from m5_competition_kaggle_spark.operators.robust import mad_outlier_stats
from m5_competition_kaggle_spark.operators.skew import salted_left_join


def test_mad_outlier_stats_known_values(spark):
    # values 1..9 plus a wild 1000: med=5 (lower median of 10), MAD from
    # |v-5| = [4,3,2,1,0,1,2,3,4,995] sorted [0,1,1,2,2,3,3,4,4,995],
    # lower median at rank 5 → 2; outliers: |v-5| > 6 → only 1000.
    rows = [("g", i, v) for i, v in enumerate([1,2,3,4,5,6,7,8,9,1000])]
    df = spark.createDataFrame(rows, "g string, tb long, v long")
    out = mad_outlier_stats(df, "g", "v", "tb", c=3).collect()[0]
    assert (out.n, out.med, out.mad, out.n_outliers) == (10, 5, 2, 1)


def test_mad_all_equal_no_outliers(spark):
    df = spark.createDataFrame(
        [("g", i, 7) for i in range(5)], "g string, tb long, v long"
    )
    out = mad_outlier_stats(df, "g", "v", "tb").collect()[0]
    assert (out.med, out.mad, out.n_outliers) == (7, 0, 0)


def test_rolling_zscore_flags_spike(spark):
    # stable series then a spike; window excludes the current row
    vals = [10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 500]
    rows = [("g", i, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, id long, v long")
    out = rolling_zscore_flags(
        df, "g", ("t", "id"), "v", window_rows=50, min_n=10, z=3
    ).collect()
    flags = {r.id: r.is_anomaly for r in out}
    assert flags[10] is True          # the spike
    assert not any(flags[i] for i in range(10))  # warm-up rows: n < 10
    # zero-variance window: dev² > 0 must flag, dev == 0 must not
    rows2 = rows + [("g", 11, 11, 500), ("g", 12, 12, 10)]
    df2 = spark.createDataFrame(rows2, "g string, t long, id long, v long")
    out2 = {r.id: r.is_anomaly for r in rolling_zscore_flags(
        df2, "g", ("t", "id"), "v", window_rows=50, min_n=10, z=3
    ).collect()}
    assert out2[11] is True   # second spike still anomalous vs window
    assert out2[12] is False  # back to the dominant level → insufficient dev


def test_rrf_fuse_hand_computed(spark):
    r1 = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2)], "k string, item string, rank long"
    )
    r2 = spark.createDataFrame(
        [("q", "b", 1), ("q", "c", 2)], "k string, item string, rank long"
    )
    out = {
        r.item: (r.rrf, r.fused_rank)
        for r in rrf_fuse([r1, r2], "k", "item", "rank", k=60).collect()
    }
    c1, c2 = 1_000_000 // 61, 1_000_000 // 62
    assert out["b"] == (c2 + c1, 1)  # in both lists → wins
    assert out["a"] == (c1, 2)       # tie vs c? no: a=16393, c=16129
    assert out["c"] == (c2, 3)


def test_rrf_fuse_tie_breaks_on_item(spark):
    r1 = spark.createDataFrame(
        [("q", "z", 1), ("q", "a", 2)], "k string, item string, rank long"
    )
    r2 = spark.createDataFrame(
        [("q", "a", 1), ("q", "z", 2)], "k string, item string, rank long"
    )
    out = {
        r.item: r.fused_rank
        for r in rrf_fuse([r1, r2], "k", "item", "rank").collect()
    }
    assert out == {"a": 1, "z": 2}  # equal rrf → lexicographic item


def test_centroid_confusion_separable(spark):
    rows = [
        (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1), (4, [0.1, 0.9], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {
        (r.true_label, r.pred_label): r.n
        for r in centroid_confusion(df).collect()
    }
    assert out == {(0, 0): 2, (1, 1): 2}  # perfectly separable
    cents = {
        (r.label, r.pos): (r.sum_q, r.n_vectors)
        for r in centroid_sums(df).collect()
    }
    assert cents[(0, 0)] == (1900, 2) and cents[(1, 1)] == (1900, 2)


def test_salted_left_join_equals_plain(spark):
    left = spark.createDataFrame(
        [(k, k * 10) for k in [1, 1, 1, 2, 3]], "k long, v long"
    )
    right = spark.createDataFrame(
        [(1, "x"), (2, "y")], "k long, tag string"
    )
    salted = salted_left_join(left, right, on=["k"], salt_buckets=4)
    plain = left.join(right, "k", "left")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
