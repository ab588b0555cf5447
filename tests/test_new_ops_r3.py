"""Unit tests for round-3 operators: asymmetric containment pairs,
code-vs-prose features, gaps-and-islands sessionization semantics.
Hand-built frames with known answers (SURVEY §5.2 adversarial style)."""

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.text import code_features
from m5_competition_kaggle_spark.operators.dedup import containment_pairs


def test_containment_asymmetric(spark):
    # b contains ALL of a's shingles; a holds only a fraction of b's.
    short = "alpha beta gamma delta"
    long_ = short + " epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    out = containment_pairs(
        df, "doc_id", "text", shingle_size=3, threshold_permille=900
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    # containment(1 in 2) = 2/2 = 1000 permille >= 900: kept.
    # containment(2 in 1) = 2/8 = 250 permille: dropped.
    assert got == {(1, 2)}
    row = out[0]
    assert row["n_common"] == 2 and row["n_a"] == 2
    assert row["containment_permille"] == 1000


def test_containment_jaccard_blindspot(spark):
    """The motivating case: symmetric jaccard(a,b) is small while
    containment(a in b) is total."""
    from m5_competition_kaggle_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    short = "one two three four"
    long_ = short + " " + " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    jac = ngram_jaccard_pairs(
        df, "doc_id", "text", shingle_size=3, threshold=0.5
    ).collect()
    assert jac == []  # symmetric metric misses it
    cont = containment_pairs(
        df, "doc_id", "text", shingle_size=3, threshold_permille=900
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in cont} == {(1, 2)}


def test_code_features_flags_symbol_dense_text(spark):
    code = "def f(x): return {x: [1, 2]};" * 3
    prose = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, code), (2, prose)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in code_features(df, "text").collect()
    }
    assert rows[1]["is_code_like"] and not rows[2]["is_code_like"]
    assert rows[1]["symbol_permille"] >= 50
    assert rows[2]["n_symbols"] == 0
    # permille identities hold exactly
    r = rows[1]
    assert r["symbol_permille"] == r["n_symbols"] * 1000 // r["n_chars_c"]


def test_sessionize_gap_boundary(spark):
    """Events exactly at the 30-minute gap stay in one session; one
    nanosecond past it starts a new session."""
    from m5_competition_kaggle_spark.queries.analytics import (
        g17_sessionize_gaps,
    )

    gap_ns = 30 * 60 * 1_000_000_000
    base = 1_600_000_000 * 1_000_000_000
    rows = [
        (1, base, 7, "view", 1.0),
        (2, base + gap_ns, 7, "view", 1.0),          # == gap: same session
        (3, base + 2 * gap_ns + 1, 7, "view", 1.0),  # > gap: new session
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_nanos long, user_id long, "
        "event_type string, value double"
    ).withColumn("ts", F.timestamp_micros(F.expr("ts_nanos div 1000")))

    import m5_competition_kaggle_spark.queries.analytics as qa
    from unittest import mock

    with mock.patch.object(qa, "load_table", lambda s, d, n: ev):
        out = g17_sessionize_gaps(spark, "unused").collect()
    sessions = {(r["user_id"], r["session_id"]): r["n_events"] for r in out}
    assert sessions == {(7, 1): 2, (7, 2): 1}
