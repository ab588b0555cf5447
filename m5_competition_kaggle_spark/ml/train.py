"""Per-group model training via grouped-map pandas UDF (SURVEY §2 M1, M3).

The reference trains one ``LGBMRegressor`` per (store, week) inside a Luigi
task grid (reference ``pipeline.py:258-266,310-335``). Spark-first, the
grid is data parallelism: ``df.groupBy("store_id", "pred_week")
.applyInPandas(train_fn, ...)`` — each group's feature matrix lands on one
executor as a pandas frame, trains there, and the fitted model travels back
as a pickled binary column. 40 groups → 40 concurrent trainings.

LightGBM is optional (not in this container): ``model_kind="lgbm"`` uses it
when importable; ``model_kind="lag7"`` is the deterministic stub — predict
= ``units_sold_lag_7`` (0 when NULL) — used by the golden E2E test
(FIXTURES.md §1.5 prescribes exactly this stub).

Scale notes (SURVEY §7.4): group size ≈ 5.9 M rows/store at full M5 scale —
set ``spark.sql.execution.arrow.maxRecordsPerBatch`` or sub-split groups
(store, dept) if executor memory is tight; training itself is the
bottleneck, not the exchange.
"""

from __future__ import annotations

import pickle
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

# schema of the default (store_id, pred_week) grouping; train_per_group
# derives the actual schema from its group_cols
TRAIN_SCHEMA = "store_id string, pred_week int, model binary, n_train long"


class Lag7Model:
    """Deterministic stub regressor: predict = lag-7 feature (0 if NULL)."""

    feature = "units_sold_lag_7"

    def predict(self, X: pd.DataFrame) -> pd.Series:
        return X[self.feature].fillna(0.0)


def _fit_group(pdf: pd.DataFrame, params: dict[str, Any]) -> bytes:
    """Fit one group's model. LightGBM when available+requested, else stub."""
    kind = params.get("model_kind", "lag7")
    if kind == "lgbm":
        try:
            from lightgbm import LGBMRegressor
        except ImportError as exc:  # pragma: no cover - lib not in container
            raise NotImplementedError(
                "model_kind='lgbm' requires lightgbm; use 'lag7'"
            ) from exc
        feature_cols = params["feature_cols"]
        train = pdf[pdf["is_valid"] == 0]
        valid = pdf[pdf["is_valid"] == 1]
        model = LGBMRegressor(**params.get("lgb_params", {}))
        # reference pipeline.py:258-264: two-entry eval_set (train, valid),
        # rmse metric, early stopping after 10 rounds
        stopping = params.get("early_stopping_rounds", 10)
        fit_kwargs = dict(
            eval_set=[
                (train[feature_cols], train["label"]),
                (valid[feature_cols], valid["label"]),
            ],
            eval_metric="rmse",
        )
        try:
            model.fit(
                train[feature_cols], train["label"],
                early_stopping_rounds=stopping, **fit_kwargs,
            )
        except TypeError:
            # lightgbm >= 4 moved early stopping to callbacks
            import lightgbm as lgb

            model.fit(
                train[feature_cols], train["label"],
                callbacks=[lgb.early_stopping(stopping)], **fit_kwargs,
            )
        return pickle.dumps(model)
    return pickle.dumps(Lag7Model())


def train_per_group(
    features: DataFrame,
    params: dict[str, Any] | None = None,
    group_cols: tuple[str, ...] = ("store_id", "pred_week"),
) -> DataFrame:
    """One model per group — the reference's 10×4 (store, week) task
    grid as a single grouped-map stage. ``group_cols`` is the
    memory/parallelism lever: (store_id, dept_id, pred_week) sub-splits
    the ~5.9 M-row store groups into ~7× smaller dept groups (280
    trainings instead of 40) when executor memory is tight — the
    output schema follows the grouping, and predict_per_group joins on
    the same columns."""
    params = params or {}
    by_name = {f.name: f for f in features.schema.fields}
    schema = ", ".join(
        f"{c} {by_name[c].dataType.simpleString()}" for c in group_cols
    ) + ", model binary, n_train long"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = _fit_group(pdf, params)
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out["model"] = [blob]
        out["n_train"] = [len(pdf)]
        return pd.DataFrame(out)

    return features.groupBy(*group_cols).applyInPandas(fit, schema)
