"""Model-based quality filtering (FineWeb/DCLM-style classifier step).

Heuristic quality scores (``functions/text.py::quality_features``) are
the bootstrap; production corpora re-rank with a trained classifier.
This module is that step on Spark ML: tokenize → hashed term frequencies
→ logistic regression, trained on weak labels and applied corpus-wide as
one distributed pipeline.

Scale shape: every stage is a narrow per-row transform (RegexTokenizer,
HashingTF, the fitted model's ``transform``) — no shuffle besides the
treeAggregate reductions inside L-BFGS training, whose cost is
O(numFeatures) per pass, independent of corpus width. Scoring 100 TB is
embarrassingly parallel; training normally runs on a small labeled
sample (``fit_quality_classifier(df.sample(...))``).

Weak labels: any boolean column works (human labels, LLM judgments, a
held-out domain flag). ``weak_labels_from_heuristic`` derives one from
the heuristic score so the pipeline is runnable end-to-end without
external data — the classifier then generalizes the heuristic through
word-level features it never saw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_FEATURES = 4096  # hashed vocab; collisions are fine for a filter model


def weak_labels_from_heuristic(
    df: DataFrame, text_col: str = "text", threshold: float = 0.75
) -> DataFrame:
    """Attach a {0,1} ``label`` column: heuristic quality >= threshold."""
    from m5_competition_kaggle_spark.functions.text import quality_features

    scored = quality_features(df, text_col)
    return scored.withColumn(
        "label", (F.col("quality_score") >= threshold).cast("double")
    ).drop(
        "n_chars_f", "avg_token_len", "stopword_ratio", "punct_ratio"
    )


def _pipeline(text_col: str):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__words", pattern=r"\s+"
            ),
            HashingTF(
                inputCol="__words", outputCol="__tf", numFeatures=N_FEATURES
            ),
            LogisticRegression(
                featuresCol="__tf", labelCol="label", maxIter=25, regParam=0.01
            ),
        ]
    )


def fit_quality_classifier(labeled: DataFrame, text_col: str = "text"):
    """Fit the tokenize→TF→LR pipeline on a labeled (sampled) frame.
    Returns the fitted PipelineModel."""
    return _pipeline(text_col).fit(labeled)


def score_quality(model, df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide scoring: appends ``model_quality`` = P(label=1).
    Per-row transforms only — scales linearly with executors."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(df)
    return out.withColumn(
        "model_quality", vector_to_array("probability")[1]
    ).drop("__words", "__tf", "rawPrediction", "probability", "prediction")


def model_keep_predicate(min_prob: float = 0.5) -> Column:
    """The filter the packing stage consumes."""
    return F.col("model_quality") >= min_prob
