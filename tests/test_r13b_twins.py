"""Bound-assert twins for the two permanently rows-only queries
(queries/extensions_r13b.py — VERDICT r12 item 5). Beyond the standard
differential gate, these tests prove the FLAGS are falsifiable: a
deliberately wrong sketch row / degenerate model score must flip the
hashed booleans, or the twin is vacuous."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r13b
from m5_competition_kaggle_spark.sources.catalog import TABLES, load_table

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "check_oracle.py"),
)
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and check_oracle)


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("sf", [SF, SF01])
@pytest.mark.parametrize("name", sorted(extensions_r13b.QUERIES))
def test_differential_vs_duckdb(spark, name, sf):
    sdf = extensions_r13b.QUERIES[name](spark, sf)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(sf)
    tbl = con.sql(extensions_r13b.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    d_types = {f.name: check_oracle.arrow_type_class(f.type)
               for f in tbl.schema}
    s_types = {f.name: check_oracle.spark_type_class(f.dataType)
               for f in sdf.schema.fields}
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert sorted(sdf.columns) == sorted(d_cols)
    assert s_types == d_types
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


# ----------------------------------------------------- falsifiability


def test_sketch_flags_flip_on_wrong_sketch(spark):
    """Feed verify_sketch_bounds a fabricated sketch row per type —
    users inflated 2x, median set to the per-type max, p99 set to the
    per-type min — and every flag must go False for every type."""
    ev = load_table(spark, SF, "events").select(
        "event_type", "user_id", "value"
    )
    wrong = ev.groupBy("event_type").agg(
        (F.countDistinct("user_id") * 2 + 100).alias("approx_users"),
        F.max("value").alias("approx_median"),
        F.min("value").alias("approx_p99"),
    )
    rows = extensions_r13b.verify_sketch_bounds(ev, wrong).collect()
    assert len(rows) > 0
    for r in rows:
        assert not r["users_within_bound"], r
        assert not r["median_within_bound"], r
        assert not r["p99_within_bound"], r


def test_sketch_flags_true_on_exact_sketch(spark):
    """The exact values themselves are trivially inside every bound —
    pins the flag polarity (a flipped comparison would fail here, not
    in the differential, where the real sketches are also in-bound)."""
    ev = load_table(spark, SF, "events").select(
        "event_type", "user_id", "value"
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("approx_users"),
        F.expr("percentile(value, 0.5)").alias("approx_median"),
        F.expr("percentile(value, 0.99)").alias("approx_p99"),
    )
    for r in extensions_r13b.verify_sketch_bounds(ev, exact).collect():
        assert r["users_within_bound"], r
        assert r["median_within_bound"], r
        assert r["p99_within_bound"], r


def test_accuracy_flags_flip_on_degenerate_model(spark):
    """A constant-score 'model' (majority-class collapse) must fail
    both accuracy floors on the real corpus: the weak-label positive
    share is 0.28-0.40 at every SF, so predicting all-keep scores
    0.28-0.40 and all-drop scores 0.60-0.72 — both below the 0.80/0.90
    floors. Checks both collapse directions."""
    from m5_competition_kaggle_spark.ml.quality import (
        weak_labels_from_heuristic,
    )

    docs = load_table(spark, SF, "documents")
    labeled = weak_labels_from_heuristic(docs)
    for const in (0.0, 1.0):
        scored = labeled.withColumn("model_quality", F.lit(const))
        row = extensions_r13b.accuracy_floor_flags(scored).collect()[0]
        assert not row["train_acc_ge_floor"], const
        assert not row["corpus_acc_ge_floor"], const


def test_accuracy_flags_true_on_perfect_model(spark):
    """Scoring with the label itself pins flag polarity at the other
    extreme: accuracy 1.0 must satisfy both floors."""
    from m5_competition_kaggle_spark.ml.quality import (
        weak_labels_from_heuristic,
    )

    docs = load_table(spark, SF, "documents")
    labeled = weak_labels_from_heuristic(docs)
    scored = labeled.withColumn("model_quality", F.col("label"))
    row = extensions_r13b.accuracy_floor_flags(scored).collect()[0]
    assert row["train_acc_ge_floor"]
    assert row["corpus_acc_ge_floor"]


def test_registered_and_certified_or_headed():
    """Both twins are registered with oracles and carry falsifiable
    evidence: a head slot THIS round, or a currently-valid banked
    driver-green row (i.e. not in the regenerated stale-promotions
    set). The original r13 form asserted a head slot outright, which
    is a one-round fact — the head-50 rotation correctly evicted the
    twins once their r13 green banked."""
    from m5_competition_kaggle_spark import queries

    head = queries._effective_head()
    qs = queries.all_queries()
    oracles = queries.all_oracles()
    for name in ("x17b_sketch_bounds", "x28b_fit_bounds"):
        assert name in qs and name in oracles
        assert (
            name in head or name not in queries.STALE_PROMOTIONS
        ), f"{name} neither headed nor validly banked"
    for name in ("x17_approx_sketches", "x28_model_quality"):
        assert name in qs and name not in oracles  # still rows-only
