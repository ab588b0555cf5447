"""Batch inference (SURVEY §2 M2): per-group model application.

The reference calls ``model.predict(X_test)`` per (store, week) shard
(``pipeline.py:294``). Here the pickled model rides along as a binary
column joined onto its group's test rows, and a grouped-map pandas UDF
unpickles once per group and predicts the whole shard in one vectorized
call — the model crosses the JVM→Python boundary once per group, not per
row.
"""

from __future__ import annotations

import pickle

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREDICT_SCHEMA = (
    "id string, store_id string, pred_week int, date date, "
    "pred_date date, pred_units_sold double"
)


def predict_per_group(
    test_features: DataFrame,
    models: DataFrame,
    group_cols: tuple[str, ...] = ("store_id", "pred_week"),
) -> DataFrame:
    """Apply each group's model to its test rows.

    ``models`` is tiny (one row per group) → broadcast join; the grouped
    map then sees (rows + model blob) together.
    """
    joined = test_features.join(F.broadcast(models), list(group_cols), "left")

    def apply_model(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = pdf["model"].iloc[0]
        if blob is None:
            # group present in test but absent from training (e.g. a store
            # with no labeled rows in the train range): keep the rows with
            # NULL predictions instead of crashing the stage on unpickle
            preds = pd.Series([None] * len(pdf), index=pdf.index,
                              dtype="float64")
        else:
            model = pickle.loads(blob)
            preds = model.predict(pdf)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "store_id": pdf["store_id"],
                "pred_week": pdf["pred_week"].astype("int32"),
                "date": pdf["date"],
                "pred_date": pdf["pred_date"],
                "pred_units_sold": pd.Series(preds, index=pdf.index,
                                             dtype="float64"),
            }
        )

    return joined.groupBy(*group_cols).applyInPandas(
        apply_model, PREDICT_SCHEMA
    )
