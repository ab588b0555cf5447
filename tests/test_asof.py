"""As-of backward join: boundary semantics on crafted frames."""

from m5_competition_kaggle_spark.operators.asof import asof_join_backward


def test_asof_backward_boundaries(spark):
    left = spark.createDataFrame(
        [
            ("u1", 5, "a"),   # before any right row → NULL
            ("u1", 10, "b"),  # exactly at right ts 10 → inclusive match
            ("u1", 15, "c"),  # between 10 and 20 → 10's value
            ("u1", 25, "d"),  # after 20 → 20's value
            ("u2", 100, "e"), # other key: only its own right rows
        ],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 20, 2.0), ("u2", 90, 9.0)],
        "k string, ts long, rv double",
    )
    out = asof_join_backward(left, right, ["k"], "ts", ["rv"])
    got = {r["tag"]: r["rv"] for r in out.collect()}
    assert got == {"a": None, "b": 1.0, "c": 1.0, "d": 2.0, "e": 9.0}
    # all left rows and columns survive
    assert sorted(out.columns) == sorted(["k", "ts", "tag", "rv"])
    assert out.count() == 5


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame([("u1", 5, "a")], "k string, ts long, tag string")
    right = spark.createDataFrame([("u1", 1, 1.0)], "k string, ts long, rv double")
    out = asof_join_backward(left, right, ["k"], "ts", ["rv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + one window shuffle on the key; no join node at all
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # union inputs coalesce into one hash exchange (+AQE reads)
