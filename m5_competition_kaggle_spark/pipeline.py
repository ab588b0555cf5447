"""Pipeline runner — the scheduler entry (SURVEY §2 L5, §3.1).

``python -m m5_competition_kaggle_spark.pipeline --config quick_one \
    --input-dir <dir> --output-dir <dir>``

replaces the reference's ``luigi.build([RunPipeline(...)])``
(``pipeline.py:402-403``): Spark provides intra-job parallelism, so the
only surviving orchestration is stage sequencing + Luigi-style resume —
each stage writes Parquet and is skipped when its ``_SUCCESS`` marker
exists (``sources.io.run_stage``; reference memo semantics
``common.py:48-65``). ``--force`` recomputes everything.

Inputs are the reference's native CSV files (``pipeline.py:28-30,362``):
``sales_train_evaluation.csv``, ``calendar.csv``, ``sell_prices.csv``,
``sample_submission.csv``.

Stage intermediates are partitioned by ``store_id`` so per-store reads
prune partitions (the reference's manual store filter, ``pipeline.py:35``).
"""

from __future__ import annotations

import argparse
import os
import time

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.config import dump_provenance, load_config
from m5_competition_kaggle_spark.ml.predict import predict_per_group
from m5_competition_kaggle_spark.ml.train import train_per_group
from m5_competition_kaggle_spark.plans.m5_pipeline import (
    add_series_features,
    assemble_submission,
    prepare_test,
    prepare_train,
    process_inputs,
    temporal_split,
)
from m5_competition_kaggle_spark.sources import io

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "pipeline_config")


def _derive_dates(features, config: dict) -> dict:
    """Fill missing train/test ranges from the data: test = final observed
    week, train = everything before it (labels self-truncate via the
    lead-NULL filter, reference ``pipeline.py:177``)."""
    need = [
        k for k in ("train_start", "train_end", "test_start", "test_end")
        if k not in config
    ]
    if not need:
        return config
    bounds = features.agg(
        F.min("date").alias("lo"), F.max("date").alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    derived = {
        "train_start": str(lo),
        "train_end": str(hi),
        "test_start": str(hi - __import__("datetime").timedelta(days=6)),
        "test_end": str(hi),
    }
    return {**derived, **config}


def run(
    spark,
    input_dir: str,
    output_dir: str,
    profile: str = "quick_one",
    force: bool = False,
) -> str:
    config = load_config(CONFIG_DIR, profile)
    stages = os.path.join(output_dir, "stages")

    sales = io.read_csv(spark, os.path.join(input_dir, "sales_train_evaluation.csv"))
    calendar = io.read_csv(spark, os.path.join(input_dir, "calendar.csv"))
    prices = io.read_csv(spark, os.path.join(input_dir, "sell_prices.csv"))
    submission = io.read_csv(spark, os.path.join(input_dir, "sample_submission.csv"))

    base = io.run_stage(
        spark, os.path.join(stages, "base"),
        lambda: process_inputs(sales, calendar, prices),
        partition_by=("store_id",), force=force,
    )
    feats = io.run_stage(
        spark, os.path.join(stages, "features"),
        lambda: add_series_features(base),
        partition_by=("store_id",), force=force,
    )
    # reference store_list knob (quick_one runs 1 store,
    # ``pipeline.py:35``): because the stage is partitionBy(store_id),
    # this equality filter is partition PRUNING, not a scan+filter.
    if config.get("stores"):
        feats = feats.filter(F.col("store_id").isin(*config["stores"]))
    config = _derive_dates(feats, config)
    # provenance is dumped AFTER date derivation so params.yaml records the
    # train/test ranges the run actually used, not the pre-derivation config
    dump_provenance(config, output_dir)

    def build_models():
        train = prepare_train(
            feats, config["pred_weeks"], config["train_start"],
            config["train_end"],
        )
        train = temporal_split(train, config.get("valid_num_days", 20))
        return train_per_group(train, config.get("ml_params", {}))

    models = io.run_stage(
        spark, os.path.join(stages, "models"), build_models, force=force
    )

    def build_preds():
        test = prepare_test(
            feats, config["pred_weeks"], config["test_start"],
            config["test_end"],
        )
        return predict_per_group(test, models)

    preds = io.run_stage(
        spark, os.path.join(stages, "preds"), build_preds, force=force
    )

    out = assemble_submission(preds, submission, config.get("horizon", 28))
    sub_path = os.path.join(output_dir, "submission")
    io.write_csv(out, sub_path)
    return sub_path


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="quick_one")
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from m5_competition_kaggle_spark.session import get_spark

    spark = get_spark("m5_pipeline", cpus=args.cpus)
    t0 = time.time()
    path = run(spark, args.input_dir, args.output_dir, args.config, args.force)
    print(f"submission written to {path} in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
