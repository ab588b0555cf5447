"""Pipeline-shaped E2E test (SURVEY §5.3, FIXTURES.md §1).

M5-miniature fixtures (2 stores × 3 items × 60 days) through the full
chain scan→unpivot→joins→windows→split→stub model→pivot→update, compared
cell-by-cell to a pandas golden computed with the REFERENCE's semantics
(melt / merge / groupby-shift / pivot_table / DataFrame.update) and the
deterministic predict-=-lag-7 stub (FIXTURES.md §1.5).
"""

import datetime

import numpy as np
import pandas as pd
import pytest

N_DAYS = 60
STORES = ("CA_1", "TX_1")
ITEMS = ("FOODS_1_001", "FOODS_1_002", "HOBBIES_1_001")
START = datetime.date(2016, 1, 1)

CONFIG = {
    "pred_weeks": [1, 2, 3, 4],
    "train_start": "2016-01-01",
    "train_end": "2016-02-22",   # d_1 .. d_53
    "test_start": "2016-02-23",  # d_54 .. d_60 (final observed week)
    "test_end": "2016-02-29",
    "valid_num_days": 7,
    "horizon": 28,
}


def units(store_i: int, item_i: int, day: int) -> int:
    # deterministic, includes zero runs so lag/roll windows see NULL + 0
    if day % 11 == 0:
        return 0
    return (day * 7 + item_i * 3 + store_i) % 5


def build_fixtures():
    rows = []
    for si, store in enumerate(STORES):
        for ii, item in enumerate(ITEMS):
            row = {
                "id": f"{item}_{store}_evaluation",
                "item_id": item,
                "dept_id": item.rsplit("_", 1)[0],
                "cat_id": item.split("_")[0],
                "store_id": store,
                "state_id": store.split("_")[0],
            }
            for d in range(1, N_DAYS + 1):
                row[f"d_{d}"] = units(si, ii, d)
            rows.append(row)
    sales_wide = pd.DataFrame(rows)

    cal = pd.DataFrame(
        {
            "date": [
                (START + datetime.timedelta(days=d - 1)).isoformat()
                for d in range(1, N_DAYS + 1)
            ],
            "wm_yr_wk": [11600 + (d - 1) // 7 for d in range(1, N_DAYS + 1)],
            "d": [f"d_{d}" for d in range(1, N_DAYS + 1)],
        }
    )
    cal["weekday"] = pd.to_datetime(cal["date"]).dt.day_name()
    cal["wday"] = pd.to_datetime(cal["date"]).dt.dayofweek + 1
    for c in ("event_name_1", "event_type_1", "event_name_2", "event_type_2"):
        cal[c] = None
    for c in ("snap_CA", "snap_TX", "snap_WI"):
        cal[c] = 0

    price_rows = []
    for si, store in enumerate(STORES):
        for ii, item in enumerate(ITEMS):
            for wk in sorted(cal["wm_yr_wk"].unique()):
                # leave one (store,item,week) absent → NULL-price filter hits
                if store == "TX_1" and item == "HOBBIES_1_001" and wk == 11600:
                    continue
                price_rows.append(
                    {
                        "store_id": store,
                        "item_id": item,
                        "wm_yr_wk": int(wk),
                        "sell_price": round(1.5 + si + 0.25 * ii, 2),
                    }
                )
    prices = pd.DataFrame(price_rows)

    sub_ids = [f"{i}_{s}_evaluation" for s in STORES for i in ITEMS]
    sub_ids.append("GHOST_1_999_CA_9_evaluation")  # must survive unchanged
    submission = pd.DataFrame({"id": sorted(sub_ids)})
    for i in range(1, 29):
        submission[f"F{i}"] = 0.0
    return sales_wide, cal, prices, submission


def golden_submission(sales_wide, cal, prices, submission):
    """Reference semantics in pandas, stub model predict = lag_7 (0 if NaN)."""
    long = sales_wide.melt(
        id_vars=["id", "item_id", "dept_id", "cat_id", "store_id", "state_id"],
        var_name="d",
        value_name="units_sold",
    )
    long = long.merge(cal[["date", "wm_yr_wk", "d"]], on="d", how="left")
    long["day_num"] = long["d"].str.extract(r"(\d+)").astype(np.int64)
    long["date"] = pd.to_datetime(long["date"])
    long = long.merge(
        prices, on=["store_id", "item_id", "wm_yr_wk"], how="left"
    )
    long = long[long["sell_price"].notnull()]
    long = long.sort_values(["id", "day_num"]).reset_index(drop=True)
    long["units_sold_lag_7"] = long.groupby("id")["units_sold"].transform(
        lambda x: x.shift(7)
    )

    test = long[
        (long["date"] >= CONFIG["test_start"])
        & (long["date"] <= CONFIG["test_end"])
    ]
    preds = []
    for wk in CONFIG["pred_weeks"]:
        p = test[["id", "date", "units_sold_lag_7"]].copy()
        p["pred_date"] = p["date"] + np.timedelta64(7 * wk, "D")
        p["pred_units_sold"] = p["units_sold_lag_7"].fillna(0.0)
        preds.append(p)
    preds_all = pd.concat(preds).sort_values(["id", "pred_date"])

    min_pd = preds_all["pred_date"].min()
    preds_all["pred_num_day"] = (
        (preds_all["pred_date"] - min_pd) / np.timedelta64(1, "D")
    ).astype(np.int64) + 1
    preds_all["pred_day_id"] = "F" + preds_all["pred_num_day"].astype(str)
    grid = preds_all.pivot_table(
        values="pred_units_sold", index="id", columns="pred_day_id"
    )
    out = submission.set_index("id")
    out.update(grid)  # non-NULL cells overwrite; ghost id untouched
    return out.reset_index().sort_values("id").reset_index(drop=True)


@pytest.fixture(scope="module")
def fixtures():
    return build_fixtures()


def test_pipeline_matches_pandas_golden(spark, fixtures):
    from m5_competition_kaggle_spark.plans.m5_pipeline import run_pipeline

    sales_wide, cal, prices, submission = fixtures
    golden = golden_submission(sales_wide, cal, prices, submission)

    got = run_pipeline(
        spark.createDataFrame(sales_wide),
        spark.createDataFrame(cal),
        spark.createDataFrame(prices),
        spark.createDataFrame(submission),
        CONFIG,
    ).toPandas().sort_values("id").reset_index(drop=True)

    assert list(got.columns) == list(golden.columns)
    assert got["id"].tolist() == golden["id"].tolist()
    f_cols = [f"F{i}" for i in range(1, 29)]
    np.testing.assert_allclose(
        got[f_cols].to_numpy(dtype=float),
        golden[f_cols].to_numpy(dtype=float),
        rtol=0, atol=0,
    )
    # the ghost id must be all zeros (overlay never invented predictions)
    ghost = got[got["id"].str.startswith("GHOST")]
    assert (ghost[f_cols].to_numpy() == 0.0).all()


def test_training_grid_one_model_per_group(spark, fixtures):
    from m5_competition_kaggle_spark.ml.train import train_per_group
    from m5_competition_kaggle_spark.plans.m5_pipeline import (
        add_series_features,
        prepare_train,
        process_inputs,
        temporal_split,
    )

    sales_wide, cal, prices, _ = fixtures
    base = process_inputs(
        spark.createDataFrame(sales_wide),
        spark.createDataFrame(cal),
        spark.createDataFrame(prices),
    )
    feats = add_series_features(base)
    train = prepare_train(
        feats, CONFIG["pred_weeks"], CONFIG["train_start"], CONFIG["train_end"]
    )
    train = temporal_split(train, CONFIG["valid_num_days"])
    models = train_per_group(train).collect()
    # 2 stores × 4 weeks = 8 models, each trained on >0 rows
    assert len(models) == 8
    assert all(m["n_train"] > 0 for m in models)
    assert {(m["store_id"], m["pred_week"]) for m in models} == {
        (s, w) for s in STORES for w in CONFIG["pred_weeks"]
    }
