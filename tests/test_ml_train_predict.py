"""ML branch tests: LGBM fit parity with the reference and the
missing-model guard in batch inference.

The gradient-boosted branch mirrors reference ``pipeline.py:258-266``:
``LGBMRegressor(**lgb_params).fit(X_train, y_train,
eval_set=[(X_train, y_train), (X_valid, y_valid)], eval_metric="rmse",
early_stopping_rounds=10)``. lightgbm is not in this container, so the
parity test runs against a recording fake injected into ``sys.modules``
(``_fit_group`` is a plain function — no executor boundary to cross) and
a second test runs the real library wherever it IS importable.
"""

import pickle
import sys
import types

import pandas as pd
import pytest


def _grid_pdf(n=30, n_valid=10):
    return pd.DataFrame(
        {
            "store_id": ["CA_1"] * n,
            "pred_week": [1] * n,
            "f1": [float(i) for i in range(n)],
            "label": [float(i % 7) for i in range(n)],
            "is_valid": [0] * (n - n_valid) + [1] * n_valid,
        }
    )


class FakeLGBMRegressor:
    """Module-level (picklable) recording stand-in for LGBMRegressor."""

    calls: dict = {}

    def __init__(self, **params):
        FakeLGBMRegressor.calls["init"] = params

    def fit(self, X, y, **kwargs):
        FakeLGBMRegressor.calls["fit"] = {
            k: v for k, v in kwargs.items() if k != "eval_set"
        }
        FakeLGBMRegressor.calls["eval_sizes"] = [
            len(ex) for ex, _ in kwargs["eval_set"]
        ]
        FakeLGBMRegressor.calls["n_train"] = len(X)


def test_lgbm_branch_passes_reference_fit_params(monkeypatch):
    """The fake records fit kwargs: two-entry eval_set (train first,
    valid second), rmse metric, early_stopping_rounds=10."""
    calls = FakeLGBMRegressor.calls
    calls.clear()
    fake = types.ModuleType("lightgbm")
    fake.LGBMRegressor = FakeLGBMRegressor
    monkeypatch.setitem(sys.modules, "lightgbm", fake)

    from m5_competition_kaggle_spark.ml.train import _fit_group

    pdf = _grid_pdf()
    blob = _fit_group(
        pdf,
        {
            "model_kind": "lgbm",
            "feature_cols": ["f1"],
            "lgb_params": {"n_estimators": 5},
        },
    )
    assert isinstance(pickle.loads(blob), FakeLGBMRegressor)
    assert calls["init"] == {"n_estimators": 5}
    assert calls["fit"]["early_stopping_rounds"] == 10
    assert calls["fit"]["eval_metric"] == "rmse"
    # (train, train) then (valid, valid), reference pipeline.py:261-262
    assert calls["eval_sizes"] == [20, 10]
    assert calls["n_train"] == 20  # fit on the train slice only


@pytest.mark.skipif(
    not pytest.importorskip("importlib.util").find_spec("lightgbm"),
    reason="lightgbm not installed",
)
def test_lgbm_branch_trains_real_model():
    from m5_competition_kaggle_spark.ml.train import _fit_group

    blob = _fit_group(
        _grid_pdf(n=60, n_valid=20),
        {
            "model_kind": "lgbm",
            "feature_cols": ["f1"],
            "lgb_params": {"n_estimators": 20, "min_child_samples": 1},
        },
    )
    model = pickle.loads(blob)
    preds = model.predict(pd.DataFrame({"f1": [1.0, 2.0]}))
    assert len(preds) == 2


def test_predict_skips_groups_without_model(spark):
    """A (store, week) group present in test but absent from training must
    yield NULL predictions, not crash the stage unpickling a NULL blob."""
    from m5_competition_kaggle_spark.ml.predict import predict_per_group
    from m5_competition_kaggle_spark.ml.train import Lag7Model

    test = spark.createDataFrame(
        [
            ("i1", "CA_1", 1, "2016-04-01", "2016-04-08", 3.0),
            ("i2", "TX_9", 1, "2016-04-01", "2016-04-08", 5.0),
        ],
        "id string, store_id string, pred_week int, date string, "
        "pred_date string, units_sold_lag_7 double",
    ).selectExpr(
        "id", "store_id", "pred_week", "cast(date as date) date",
        "cast(pred_date as date) pred_date", "units_sold_lag_7",
    )
    models = spark.createDataFrame(
        [("CA_1", 1, bytearray(pickle.dumps(Lag7Model())), 10)],
        "store_id string, pred_week int, model binary, n_train long",
    )
    out = {r["id"]: r for r in predict_per_group(test, models).collect()}
    assert out["i1"]["pred_units_sold"] == 3.0  # modeled group predicts
    assert out["i2"]["pred_units_sold"] is None  # unmodeled group → NULL
    assert len(out) == 2  # no rows dropped


def test_train_predict_sub_split_grouping(spark):
    """group_cols is the memory lever: a (store, dept, week) sub-split
    trains one model per dept group, the model table carries the
    grouping columns, and prediction joins on the same columns —
    end-to-end with the lag-7 stub."""
    from m5_competition_kaggle_spark.ml.predict import predict_per_group
    from m5_competition_kaggle_spark.ml.train import train_per_group

    rows = [
        ("CA_1", dept, 1, float(i), 1.0 + i, 0)
        for dept in ("FOODS", "HOBBIES")
        for i in range(6)
    ]
    feats = spark.createDataFrame(
        rows,
        "store_id string, dept_id string, pred_week int, "
        "label double, units_sold_lag_7 double, is_valid int",
    )
    gc = ("store_id", "dept_id", "pred_week")
    models = train_per_group(feats, group_cols=gc)
    got = models.collect()
    assert {tuple(r[c] for c in gc) for r in got} == {
        ("CA_1", "FOODS", 1), ("CA_1", "HOBBIES", 1)
    }
    assert all(r["n_train"] == 6 for r in got)

    test = spark.createDataFrame(
        [
            ("a", "CA_1", "FOODS", 1, "2016-04-01", "2016-04-08", 7.0),
            ("b", "CA_1", "PETS", 1, "2016-04-01", "2016-04-08", 9.0),
        ],
        "id string, store_id string, dept_id string, pred_week int, "
        "date string, pred_date string, units_sold_lag_7 double",
    ).selectExpr(
        "id", "store_id", "dept_id", "pred_week",
        "cast(date as date) date",
        "cast(pred_date as date) pred_date", "units_sold_lag_7",
    )
    out = {
        r["id"]: r
        for r in predict_per_group(test, models, group_cols=gc).collect()
    }
    assert out["a"]["pred_units_sold"] == 7.0
    assert out["b"]["pred_units_sold"] is None  # unmodeled dept
