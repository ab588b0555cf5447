"""Model-based quality classifier: train on weak labels at sf0.001,
check the model separates its training signal and generalizes the
ranking (non-oracle-able ML per SURVEY §2.1 — pytest-certified)."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.ml.quality import (
    fit_quality_classifier,
    model_keep_predicate,
    score_quality,
    weak_labels_from_heuristic,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_quality_classifier_end_to_end(spark):
    docs = load_table(spark, SF, "documents")
    labeled = weak_labels_from_heuristic(docs, threshold=0.75)
    n_pos = labeled.filter("label = 1.0").count()
    assert 0 < n_pos < labeled.count(), "weak labels must be non-degenerate"

    model = fit_quality_classifier(labeled)
    scored = score_quality(model, labeled)

    # schema contract: original columns + model_quality, no ML temporaries
    assert "model_quality" in scored.columns
    assert not any(c.startswith("__") for c in scored.columns)

    # the model must rank its own training classes: mean P(good) of
    # positives clearly above negatives (AUC proxy)
    stats = {
        r["label"]: r["p"]
        for r in scored.groupBy("label")
        .agg(F.avg("model_quality").alias("p"))
        .collect()
    }
    assert stats[1.0] > stats[0.0] + 0.2, stats

    # the keep predicate actually filters, deterministically
    kept1 = scored.filter(model_keep_predicate(0.5)).count()
    kept2 = scored.filter(model_keep_predicate(0.5)).count()
    assert kept1 == kept2
    assert 0 < kept1 < labeled.count()


def test_scoring_is_per_row_no_shuffle(spark):
    """Corpus scoring must stay narrow: no Exchange in the scoring plan
    (training may shuffle; applying the model must not)."""
    docs = load_table(spark, SF, "documents")
    labeled = weak_labels_from_heuristic(docs)
    model = fit_quality_classifier(labeled)
    plan = (
        score_quality(model, docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_fixed_weight_logits_hand_computed(spark):
    """x44's scoring surface: integer logit equals the driver-side
    h64_py recomputation token-for-token, empty docs score 0/keep."""
    from m5_competition_kaggle_spark.functions.text import h64_py
    from m5_competition_kaggle_spark.ml.quality import (
        N_FEATURES,
        fixed_weight_logits,
    )

    df = spark.createDataFrame(
        [(1, "Alpha beta ALPHA"), (2, ""), (3, "gamma")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_terms"], r["logit_units"], r["keep"])
        for r in fixed_weight_logits(df).collect()
    }

    def logit(text):
        toks = [t for t in text.lower().split() if t]
        w = [
            (h64_py(str(h64_py(t) % N_FEATURES)) % 2001) - 1000
            for t in toks
        ]
        return len(toks), sum(w), int(sum(w) >= 0)

    assert out[1] == logit("Alpha beta ALPHA")
    assert out[2] == (0, 0, 1)
    assert out[3] == logit("gamma")


def test_fixed_weight_logits_no_shuffle(spark):
    """The certified scoring path must stay narrow like model scoring."""
    from m5_competition_kaggle_spark.ml.quality import fixed_weight_logits

    docs = load_table(spark, SF, "documents")
    plan = (
        fixed_weight_logits(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
