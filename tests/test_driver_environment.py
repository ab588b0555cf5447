"""Driver-environment robustness: the driver imports
``__spark_entry__`` with its OWN SparkSession (no engine configs), so
``load_table`` must defensively pin the two session settings results
depend on — UTC session timezone (date-part functions are TZ-sensitive)
and nanos-as-long parquet reading (events.ts is TIMESTAMP(NANOS)).
These tests perturb the shared session the way a foreign driver might
and assert the query surface self-heals."""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture
def restore_tz(spark):
    orig = spark.conf.get("spark.sql.session.timeZone", "UTC")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", orig)


def test_time_features_survive_foreign_timezone(spark, restore_tz):
    """q13's date parts must not shift when a foreign driver session
    arrives in a non-UTC timezone. The baseline runs BEFORE the
    perturbation (an earlier version perturbed first via fixture,
    making the comparison vacuous — r5 ADVICE)."""
    import m5_competition_kaggle_spark.queries.core as core

    baseline = core.QUERIES["q13_time_features"](spark, SF).collect()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    # conf is America/New_York now; load_table must re-pin
    perturbed = core.QUERIES["q13_time_features"](spark, SF).collect()
    assert sorted(map(tuple, perturbed)) == sorted(map(tuple, baseline))
    # and the query path genuinely restored UTC for its own evaluation
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_events_nanos_readable_after_conf_clear(spark):
    """events.parquet carries TIMESTAMP(NANOS); load_table must set the
    legacy nanosAsLong conf itself rather than assume the session
    already has it."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    ev = load_table(spark, SF, "events")
    rows = ev.select("ts", "ts_nanos").limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.ts is not None and isinstance(r.ts_nanos, int)


def test_interval_query_stable_under_foreign_timezone(spark, restore_tz):
    """x67 does all time arithmetic in integer epoch-nanos, so a
    foreign session timezone must not move a single window boundary.
    Baseline in UTC, rerun under a perturbed session timezone."""
    import m5_competition_kaggle_spark.queries.extensions_r6 as r6

    a = r6.QUERIES["x67_interval_join"](spark, SF).collect()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    b = r6.QUERIES["x67_interval_join"](spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0
