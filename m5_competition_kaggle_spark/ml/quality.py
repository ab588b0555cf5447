"""Model-based quality filtering (FineWeb/DCLM-style classifier step).

Heuristic quality scores (``functions/text.py::quality_features``) are
the bootstrap; production corpora re-rank with a trained classifier.
This module is that step on Spark ML: tokenize → hashed term frequencies
→ logistic regression, trained on weak labels and applied corpus-wide as
one distributed pipeline.

The feature path is deliberately **oracle-certifiable**: term buckets are
``pmod(h64(token), N_FEATURES)`` — the engine's md5-based cross-engine
hash — rather than Spark ML HashingTF's MurmurHash3 (which no SQL engine
reproduces). ``hashed_tf_pairs`` exposes the exact (doc, bucket, tf)
relation the model consumes, and the x36 query hash-checks it against a
DuckDB twin; only the L-BFGS-fitted probabilities remain rows-only (the
split the r2 audit asked for: "Spark ML plumbing correct" certified
separately from "optimizer converged").

Scale shape: bucketing is a pure JVM column expression; the bucket→count
sparse vector comes from a fixed-vocabulary ``CountVectorizerModel`` —
all narrow JVM per-row transforms, so corpus-wide scoring has NO shuffle
(plan-asserted in tests) and LR's gradient passes stay O(nnz). Training
normally runs on a small labeled sample
(``fit_quality_classifier(df.sample(...))``).

Weak labels: any boolean column works (human labels, LLM judgments, a
held-out domain flag). ``weak_labels_from_heuristic`` derives one from
the heuristic score so the pipeline is runnable end-to-end without
external data — the classifier then generalizes the heuristic through
word-level features it never saw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.text import h64, tokens

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


def tf_buckets(text_col: str | Column) -> Column:
    """array<int> of feature buckets, one per token: lowercase, split on
    whitespace, drop empties, ``pmod(h64(token), N_FEATURES)``. Pure JVM
    expressions — this IS the model's feature hash, and a SQL engine can
    replicate it bit-for-bit."""
    toks = F.filter(tokens(F.lower(text_col)), lambda t: t != F.lit(""))
    return F.transform(
        toks, lambda t: F.pmod(h64(t), F.lit(N_FEATURES)).cast("int")
    )


def hashed_tf_pairs(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The certifiable feature relation: (key, bucket, tf) term
    frequencies exactly as the classifier consumes them (explode +
    hash-agg form — the query/oracle view of the per-row bincount)."""
    return (
        df.select(
            F.col(key_col), F.explode(tf_buckets(text_col)).alias("bucket")
        )
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _featurize(df: DataFrame, text_col: str) -> DataFrame:
    """Append ``__tf``: the SPARSE N_FEATURES count vector per row.

    Buckets are computed JVM-side (``tf_buckets``), then counted into a
    sparse vector by a ``CountVectorizerModel`` with the FIXED vocabulary
    "0".."N_FEATURES-1" — vocabulary index i ≡ bucket i, so the vector
    holds exactly the (bucket, tf) pairs ``hashed_tf_pairs`` certifies.
    Everything stays in the JVM and per-row (no shuffle, no Python);
    sparse vectors keep LR's gradient passes O(nnz), not O(N_FEATURES).
    """
    from pyspark.ml.feature import CountVectorizerModel

    cv = CountVectorizerModel.from_vocabulary(
        [str(i) for i in range(N_FEATURES)],
        inputCol="__bstr",
        outputCol="__tf",
    )
    out = df.withColumn(
        "__bstr",
        F.transform(tf_buckets(text_col), lambda b: b.cast("string")),
    )
    return cv.transform(out).drop("__bstr")


def fit_quality_classifier(labeled: DataFrame, text_col: str = "text"):
    """Fit logistic regression on the h64-bucketed TF features of a
    labeled (sampled) frame. Returns the fitted LogisticRegressionModel."""
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        featuresCol="__tf", labelCol="label", maxIter=25, regParam=0.01
    )
    return lr.fit(_featurize(labeled, text_col))


def score_quality(model, df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide scoring: appends ``model_quality`` = P(label=1).
    Per-row transforms only — scales linearly with executors."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(_featurize(df, text_col))
    return out.withColumn(
        "model_quality", vector_to_array("probability")[1]
    ).drop("__tf", "rawPrediction", "probability", "prediction")


def model_keep_predicate(min_prob: float = 0.5) -> Column:
    """The filter the packing stage consumes."""
    return F.col("model_quality") >= min_prob


def fixed_weight_logits(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The classifier's SCORING surface, hash-certifiable (r3 verdict
    item 4): per-doc linear score over the exact ``tf_buckets`` features
    the trained model consumes, with a FIXED deterministic weight vector
    w[b] = (h64(str(b)) % 2001) − 1000 embedded identically in the SQL
    oracle (x44). All int64: logit_units = Σ_token w[bucket(token)]
    (equal to Σ_bucket tf·w), keep = logit ≥ 0.

    Sigmoid is monotone, so the keep decision and ranking are identical
    to P(label)=sigmoid(logit/scale) thresholding — certifying the
    integer logit certifies the score surface without cross-engine
    ``exp()`` last-ulp risk (the repo's integer-exactness policy; see
    x33/x41/s8). What remains rows-only in x28 is ONLY the L-BFGS fit.
    Pure per-row column expressions — corpus scoring stays shuffle-free."""
    b = tf_buckets(text_col)
    wsum = F.aggregate(
        b,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.pmod(h64(x.cast("string")), F.lit(2001))
        - F.lit(1000),
    )
    return df.select(
        F.col(key_col),
        F.size(b).cast("long").alias("n_terms"),
        wsum.alias("logit_units"),
        (wsum >= 0).cast("int").alias("keep"),
    )
