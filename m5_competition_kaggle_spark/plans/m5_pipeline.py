"""The M5 pipeline as ONE lazy Spark program (SURVEY §7.1).

The reference runs 9 Luigi tasks × a 10-store × 4-week task grid, each an
eager pandas script exchanging pickles (reference ``pipeline.py``
throughout; task map in SURVEY §3.1). Here the grid collapses into data
parallelism: ``store_id`` stays a column (partition key), ``pred_week``
becomes a column produced by unpivoting the four lead labels, and the
whole flow is one Catalyst plan per stage boundary. Stage-by-stage
reference parity:

- ``process_inputs``      = ProcessInputFiles   (``pipeline.py:23-76``)
- ``add_series_features`` = SalesTimeSeriesFeatures (``pipeline.py:79-128``)
- ``prepare_train``       = PrepareTrainData    (``pipeline.py:131-181``)
- ``prepare_test``        = PrepareTestData     (``pipeline.py:184-228``)
- ``temporal_split``      = TrainModel's split  (``pipeline.py:245-256``)
- ml.train / ml.predict   = TrainModel / RunPrediction* (``231-355``)
- ``assemble_submission`` = RunSubmission       (``pipeline.py:358-382``)

Scale design: the only wide shuffles are (a) the price join keyed on
(store_id, item_id, wm_yr_wk) and (b) the single window shuffle on ``id``
that computes every lag/roll/lead column at once; calendar and the model
table broadcast. Writing intermediates ``partitionBy("store_id")`` turns
the reference's per-store filter into partition pruning.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.datetime import time_features
from m5_competition_kaggle_spark.ml.predict import predict_per_group
from m5_competition_kaggle_spark.ml.train import train_per_group
from m5_competition_kaggle_spark.operators.relational import (
    filter_between,
    filter_not_null,
    last_n_distinct_min,
    left_join,
)
from m5_competition_kaggle_spark.operators.reshape import (
    keyed_update,
    pivot_avg,
    unpivot,
)
from m5_competition_kaggle_spark.operators.window import (
    series_window,
    with_lags,
    with_trailing_means,
)

ID_COLS = ("id", "item_id", "dept_id", "cat_id", "store_id", "state_id")
SERIES_ORDER = ("day_num",)


def process_inputs(
    sales_wide: DataFrame,
    calendar: DataFrame,
    prices: DataFrame,
    drop_event_cols: bool = True,
) -> DataFrame:
    """Wide sales → long, calendar + price attach, price-known filter.

    Mirrors ProcessInputFiles: melt (``pipeline.py:46-48``), day-number
    regex (``62-64``), calendar broadcast join (``60``), price join
    (``66``), ``sell_price`` NULL filter (``72``). Event/snap columns are
    dropped as the reference does (``87-97``).
    """
    day_cols = [c for c in sales_wide.columns if c.startswith("d_")]
    long = unpivot(sales_wide, list(ID_COLS), day_cols, "d", "units_sold")
    cal = calendar
    if drop_event_cols:
        cal = cal.drop(
            "event_name_1", "event_type_1", "event_name_2", "event_type_2",
            "snap_CA", "snap_TX", "snap_WI", "weekday", "wday",
        )
    out = left_join(long, cal, ["d"], broadcast_right=True)
    out = out.withColumn(
        "day_num", F.regexp_extract("d", r"(\d+)", 1).cast("long")
    )
    out = out.withColumn("date", F.to_date("date"))
    out = left_join(out, prices, ["store_id", "item_id", "wm_yr_wk"])
    return filter_not_null(out, ["sell_price"])


def add_series_features(
    df: DataFrame,
    lags: Sequence[int] = (1, 2, 7, 14, 28),
    rolls: Sequence[int] = (7, 14, 28),
) -> DataFrame:
    """Lag/rolling-mean/time features — ONE window shuffle for all of them
    (SalesTimeSeriesFeatures, ``pipeline.py:102-124``; time features
    ``utils.py:10-23``)."""
    out = with_lags(
        df, "units_sold", lags, ["id"], list(SERIES_ORDER),
        "units_sold_lag_{k}",
    )
    out = with_trailing_means(
        out, "units_sold", rolls, ["id"], list(SERIES_ORDER),
        "units_sold_roll_mean_{k}",
    )
    return time_features(out, "date")


def prepare_train(
    features: DataFrame,
    pred_weeks: Sequence[int],
    train_start: str,
    train_end: str,
) -> DataFrame:
    """Lead labels for every pred_week in one pass, then long-form.

    The reference computes ``shift(-7w)`` per (store, week) task
    (``pipeline.py:172-176``); here all four leads are extra columns from
    the SAME window shuffle, unpivoted to (pred_week, label, pred_date)
    rows. Label-less rows (series tail) are dropped per ``pipeline.py:177``.
    """
    w = series_window(["id"], list(SERIES_ORDER))
    out = filter_between(features, "date", train_start, train_end)
    lead_cols = {}
    for wk in pred_weeks:
        lead_cols[f"__label_{wk}"] = F.lead("units_sold", 7 * wk).over(w)
        lead_cols[f"__pdate_{wk}"] = F.lead("date", 7 * wk).over(w)
    out = out.withColumns(lead_cols)
    # pair-unpivot via stack: (pred_week, label, pred_date)
    n = len(pred_weeks)
    stack_args = ", ".join(
        f"{wk}, __label_{wk}, __pdate_{wk}" for wk in pred_weeks
    )
    keep = [c for c in out.columns if not c.startswith("__")]
    out = out.selectExpr(
        *keep,
        f"stack({n}, {stack_args}) AS (pred_week, label, pred_date)",
    )
    return filter_not_null(out, ["pred_date"])


def prepare_test(
    features: DataFrame,
    pred_weeks: Sequence[int],
    test_start: str,
    test_end: str,
) -> DataFrame:
    """Test rows: the final observed week fanned out × pred_weeks with
    ``pred_date = date + 7·week`` (PrepareTestData, ``pipeline.py:289-291``
    — arithmetic, not lead: the future rows don't exist)."""
    base = filter_between(features, "date", test_start, test_end)
    weeks = ", ".join(str(w) for w in pred_weeks)
    out = base.withColumn(
        "pred_week", F.explode(F.expr(f"array({weeks})"))
    )
    return out.withColumn(
        "pred_date", F.expr("date_add(date, 7 * pred_week)")
    )


def temporal_split(train: DataFrame, valid_num_days: int) -> DataFrame:
    """is_valid flag: last N distinct dates are validation
    (``pipeline.py:245-256``). The cutoff is a 1-row aggregate broadcast
    back — no global window."""
    cutoff = last_n_distinct_min(train, "date", valid_num_days).select(
        F.col("min_date").alias("__cutoff")
    )
    return (
        train.crossJoin(F.broadcast(cutoff))
        .withColumn(
            "is_valid", (F.col("date") >= F.col("__cutoff")).cast("int")
        )
        .drop("__cutoff")
    )


def assemble_submission(
    preds: DataFrame,
    sample_submission: DataFrame,
    horizon: int = 28,
) -> DataFrame:
    """Predictions → F1..F28 grid → overlay onto the submission template
    (RunSubmission, ``pipeline.py:358-382``): day index from global min
    pred_date (F7), 'F'+n tag (F2), pivot with mean (R2/A4), keyed update
    that only overwrites non-NULL cells (R3)."""
    min_d = preds.agg(F.min("pred_date").alias("__min_pd"))
    tagged = (
        preds.crossJoin(F.broadcast(min_d))
        .withColumn(
            "pred_num_day",
            (F.datediff("pred_date", "__min_pd") + 1).cast("int"),
        )
        .withColumn(
            "pred_day_id",
            F.concat(F.lit("F"), F.col("pred_num_day").cast("string")),
        )
    )
    f_cols = [f"F{i}" for i in range(1, horizon + 1)]
    grid = pivot_avg(tagged, "id", "pred_day_id", "pred_units_sold", f_cols)
    return keyed_update(sample_submission, grid, ["id"], f_cols).orderBy("id")


def run_pipeline(
    sales_wide: DataFrame,
    calendar: DataFrame,
    prices: DataFrame,
    sample_submission: DataFrame,
    config: dict[str, Any],
) -> DataFrame:
    """End-to-end: scan → features → split → per-group train → predict →
    submission overlay. Returns the submission DataFrame (sink is the
    caller's choice: ``io.write_csv`` for the reference's S3 semantics)."""
    base = process_inputs(sales_wide, calendar, prices)
    feats = add_series_features(base)

    train = prepare_train(
        feats,
        config["pred_weeks"],
        config["train_start"],
        config["train_end"],
    )
    train = temporal_split(train, config.get("valid_num_days", 20))
    models = train_per_group(train, config.get("ml_params", {}))

    test = prepare_test(
        feats, config["pred_weeks"], config["test_start"], config["test_end"]
    )
    preds = predict_per_group(test, models)
    return assemble_submission(
        preds, sample_submission, config.get("horizon", 28)
    )
