"""CLI runner + staged resume tests (SURVEY §2 L3/L5, S1/S2/S3).

Drives the full CSV→staged-parquet→submission-CSV flow through
``m5_competition_kaggle_spark.pipeline.run`` on the miniature fixtures,
then asserts Luigi-style resume: a second run must NOT recompute finished
stages (verified by mtime), and ``force=True`` must.
"""

import os

import pytest

from test_m5_pipeline_e2e import build_fixtures, golden_submission


@pytest.fixture(scope="module")
def csv_inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("m5_csv")
    sales, cal, prices, submission = build_fixtures()
    sales.to_csv(d / "sales_train_evaluation.csv", index=False)
    cal.to_csv(d / "calendar.csv", index=False)
    prices.to_csv(d / "sell_prices.csv", index=False)
    submission.to_csv(d / "sample_submission.csv", index=False)
    return str(d), (sales, cal, prices, submission)


def _success_mtimes(stages_dir):
    out = {}
    for stage in os.listdir(stages_dir):
        marker = os.path.join(stages_dir, stage, "_SUCCESS")
        if os.path.exists(marker):
            out[stage] = os.path.getmtime(marker)
    return out


def test_runner_end_to_end_and_resume(spark, csv_inputs, tmp_path):
    import pandas as pd

    from m5_competition_kaggle_spark.pipeline import run

    input_dir, (sales, cal, prices, submission) = csv_inputs
    out_dir = str(tmp_path / "out")

    sub_path = run(spark, input_dir, out_dir, profile="quick_all")

    # provenance dumped next to outputs (reference common.py:28-30)
    assert os.path.exists(os.path.join(out_dir, "params.yaml"))

    # submission matches the golden for the derived date config:
    # derived test window = last 7 days == the E2E CONFIG's window
    part = [
        f for f in os.listdir(sub_path) if f.endswith(".csv")
    ]
    got = (
        pd.read_csv(os.path.join(sub_path, part[0]))
        .sort_values("id")
        .reset_index(drop=True)
    )
    golden = golden_submission(sales, cal, prices, submission)
    f_cols = [f"F{i}" for i in range(1, 29)]
    pd.testing.assert_frame_equal(
        got[["id"] + f_cols], golden[["id"] + f_cols], check_dtype=False
    )

    # resume: second run leaves every stage untouched
    stages_dir = os.path.join(out_dir, "stages")
    before = _success_mtimes(stages_dir)
    assert set(before) == {"base", "features", "models", "preds"}
    run(spark, input_dir, out_dir, profile="quick_all")
    assert _success_mtimes(stages_dir) == before

    # force recomputes
    run(spark, input_dir, out_dir, profile="quick_all", force=True)
    after = _success_mtimes(stages_dir)
    assert all(after[s] > before[s] for s in before)


def test_config_layering(tmp_path):
    from m5_competition_kaggle_spark.config import load_config
    from m5_competition_kaggle_spark.pipeline import CONFIG_DIR

    quick = load_config(CONFIG_DIR, "quick_one")
    full = load_config(CONFIG_DIR, "full")
    assert quick["pred_weeks"] == [1]          # profile overrides base
    assert quick["horizon"] == 28              # base key survives
    assert full["ml_params"]["lgb_params"]["n_estimators"] == 2000
