"""Staged certification for the round-20 queue
(queries/extensions_r20.py — x195 residual ACF, x196 discount lift,
x197 weekend shift; x203 bucket balance + x204 join-cardinality
audit added r13 second session). Same local gate as the r10-r19 queues: the
check_oracle differential at sf0.001 AND sf0.01, hand pins,
cross-query identity pins."""

from __future__ import annotations

import datetime
import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r20
from m5_competition_kaggle_spark.sources.catalog import TABLES

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


@pytest.mark.parametrize("name", sorted(extensions_r20.QUERIES))
def test_differential_vs_duckdb(spark, name):
    sdf = extensions_r20.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r20.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    d_types = {f.name: check_oracle.arrow_type_class(f.type)
               for f in tbl.schema}
    s_types = {f.name: check_oracle.spark_type_class(f.dataType)
               for f in sdf.schema.fields}
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert sorted(s_cols) == sorted(d_cols)
    assert s_types == d_types
    assert check_oracle.value_hash(s_rows, s_cols) == \
        check_oracle.value_hash(d_rows, d_cols)


@pytest.mark.parametrize("name", sorted(extensions_r20.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    sdf = extensions_r20.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r20.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


# ------------------------------------------------------- x195 pins


def test_residual_acf_structure(spark):
    """Lag 0 is the residual variance itself (ratio exactly 1000);
    the residual series is 7 days shorter than the raw one (the lag-7
    differencing), and negative ratios occur — differenced noise
    mean-reverts, which the raw-volume x170 profile never shows."""
    from m5_competition_kaggle_spark.queries.extensions_r13 import (
        x170_acf_profile,
    )

    out = extensions_r20.x195_residual_acf(spark, SF01).collect()
    assert len(out) == 40
    raw = {
        (r["event_type"], r["k"]): r["n_pairs"]
        for r in x170_acf_profile(spark, SF01).collect()
    }
    for r in out:
        if r["k"] == 0:
            assert r["ratio_permille"] == 1000
        # differencing removes exactly 7 leading days per series
        assert r["n_pairs"] == raw[(r["event_type"], r["k"])] - 7
    assert any(
        r["ratio_permille"] is not None and r["ratio_permille"] < 0
        for r in out
    )


# ------------------------------------------------------- x196 pins


def test_discount_lift_hand_ols(spark):
    """Planted exact OLS: y = 2x + 1 over x in {0, 1, 2, 3} gives
    slope_num/slope_den = 2 exactly, slope_ppm = 2,000,000."""
    df = spark.createDataFrame(
        [("B", x, 2 * x + 1) for x in range(4)],
        "p_brand string, x long, y long",
    )
    agg = (
        df.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .alias("num"),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .alias("den"),
        )
        .collect()[0]
    )
    assert agg["num"] == 2 * agg["den"]


def test_discount_lift_fixture_shape(spark):
    out = extensions_r20.x196_discount_lift(spark, SF01).collect()
    assert len(out) == 25
    for r in out:
        assert r["n"] > 0 and r["slope_den"] > 0
        assert r["slope_ppm"] is not None
    assert len({r["slope_ppm"] for r in out}) > 5


# ------------------------------------------------------- x197 pins


def test_weekend_rule_is_sat_sun(spark):
    """Epoch day 0 = Thursday 1970-01-01, so day % 7 == 2 is Saturday
    and == 3 is Sunday — verified against the calendar."""
    assert datetime.date(1970, 1, 1).weekday() == 3  # Thursday
    for d in range(14):
        date = datetime.date(1970, 1, 1) + datetime.timedelta(days=d)
        assert (d % 7 in (2, 3)) == (date.weekday() >= 5), d


def test_weekend_shift_identities(spark):
    """Per type: wd + we day counts cover the calendar; the
    sign-handled mean difference reconstructs from the integer
    moments."""
    out = extensions_r20.x197_weekend_shift(spark, SF01).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_wd"] > 0 and r["n_we"] > 0
        num = r["sum_we"] * r["n_wd"] - r["sum_wd"] * r["n_we"]
        den = r["n_wd"] * r["n_we"]
        expect = (
            (1000 * num) // den
            if num >= 0
            else -((1000 * (-num)) // den)
        )
        assert r["meandiff_pm"] == expect
        # weekday + weekend day counts = the type's observed days
        assert r["n_wd"] + r["n_we"] >= 28


# -------------------------------------------------- x203/x204 pins


def test_bucket_balance_grid_and_bad_key(spark):
    """The fixed 2x64 grid; the event_type key (5 values) must land
    in at most 5 nonempty buckets - the bad-bucketing-key signature
    the certificate exists to flag - while user_id spreads; shares
    are truncating so they sum to at most 10^6 per key (and within
    64 ppm of it)."""
    out = extensions_r20.x203_bucket_balance(spark, SF01).collect()
    assert len(out) == 2 * 64
    by_key = {}
    for r in out:
        by_key.setdefault(r["key_name"], []).append(r)
    for key, rows in by_key.items():
        assert sorted(r["bucket"] for r in rows) == list(range(64))
        share = sum(r["share_ppm"] for r in rows)
        assert 1_000_000 - 64 <= share <= 1_000_000
    et_nonzero = [
        r for r in by_key["event_type"] if r["n_events"] > 0
    ]
    assert 1 <= len(et_nonzero) <= 5
    uid_nonzero = [
        r for r in by_key["user_id"] if r["n_events"] > 0
    ]
    assert len(uid_nonzero) >= 32  # 150 users over 64 buckets


def test_bucket_balance_hash_is_the_engine_hash(spark):
    """The certificate must measure the REAL h64 layout: the 'click'
    events land exactly in bucket h64_py('click') % 64."""
    from m5_competition_kaggle_spark.functions.text import h64_py

    out = extensions_r20.x203_bucket_balance(spark, SF01).collect()
    click_bucket = h64_py("click") % 64
    et = {
        r["bucket"]: r["n_events"]
        for r in out
        if r["key_name"] == "event_type" and r["n_events"] > 0
    }
    assert click_bucket in et


def test_join_audit_estimate_is_exact(spark):
    """est_output_rows must equal the REAL join size - the estimator
    is exact arithmetic, not an estimate; plus the FK-shape pins
    (custkey unique on the customer side)."""
    from m5_competition_kaggle_spark.sources.catalog import (
        load_table,
    )

    r = extensions_r20.x204_join_cardinality_audit(
        spark, SF01
    ).collect()[0]
    orders = load_table(spark, SF01, "orders")
    cust = load_table(spark, SF01, "customer")
    actual = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    assert r["est_output_rows"] == actual
    assert r["n_right_keys"] == cust.count()
    assert r["max_right_fanout"] == 1
    assert r["n_shared_keys"] <= r["n_left_keys"]
    assert r["n_shared_keys"] <= r["n_right_keys"]
    assert r["left_orphan_rows"] == 0  # every order has a customer
    # fixture-measured: every customer also has orders (the synthetic
    # generator differs from real TPC-H here); the orphan identity
    # must hold either way
    assert (
        r["right_orphan_rows"]
        == 0  # == sum cnt_r over keys with cnt_l == 0
    )
    assert r["n_right_keys"] - r["n_shared_keys"] == 0


def test_join_audit_planted_orphans_both_sides(spark):
    """Planted frame exercising every audit column the fixture can't
    (it has no orphans on either side): customers {1,2,3}, orders on
    custkeys {2,2,9} - orphan order rows AND orphan customers, a 2x
    left fan-out, and the exact product identity."""
    import shutil
    import tempfile

    import os as _os

    d = tempfile.mkdtemp(prefix="x204_orphans_")
    try:
        spark.createDataFrame(
            [(1, 2, "O", 1.0, "2024-01-01 00:00:00", "1-URGENT"),
             (2, 2, "O", 1.0, "2024-01-01 00:00:00", "1-URGENT"),
             (3, 9, "O", 1.0, "2024-01-01 00:00:00", "1-URGENT")],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string,"
            " o_orderpriority string",
        ).withColumn(
            "o_orderdate", F.to_timestamp("o_orderdate")
        ).coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(d, "orders.parquet")
        )
        spark.createDataFrame(
            [(1, "a", 0, 0.0, "BUILDING"),
             (2, "b", 0, 0.0, "BUILDING"),
             (3, "c", 0, 0.0, "BUILDING")],
            "c_custkey long, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string",
        ).coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(d, "customer.parquet")
        )
        r = extensions_r20.x204_join_cardinality_audit(
            spark, d
        ).collect()[0]
        assert r["n_left_keys"] == 2       # {2, 9}
        assert r["n_right_keys"] == 3      # {1, 2, 3}
        assert r["n_shared_keys"] == 1     # {2}
        assert r["left_orphan_rows"] == 1  # the custkey-9 order
        assert r["right_orphan_rows"] == 2  # customers 1 and 3
        assert r["max_left_fanout"] == 2
        assert r["max_right_fanout"] == 1
        assert r["est_output_rows"] == 2   # 2 orders x 1 customer
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ------------------------------------------------------- x210 pins


def test_key_skew_planted_uniform_and_hot(spark):
    """Closed forms: a perfectly uniform key reads skew_ppm exactly
    10^6 and hhi_ppm exactly 10^6 DIV n_keys; a 98/1/1 hot-key split
    reads skew 2,940,000 (2.94x fair share) and hhi 960,600."""
    import shutil
    import tempfile

    import os as _os

    rows = []
    eid = 0
    # uniform: users 1..4, 25 events each
    for uid in range(1, 5):
        for _ in range(25):
            rows.append((eid, uid, "view"))
            eid += 1
    d = tempfile.mkdtemp(prefix="x210_plant_")
    try:
        def _write(rs):
            spark.createDataFrame(
                rs, "event_id long, user_id long, event_type string"
            ).select(
                "event_id",
                F.timestamp_micros(
                    F.lit(1_704_067_200_000_000) + F.col("event_id")
                ).alias("ts"),
                "user_id",
                "event_type",
                F.lit(1.0).alias("value"),
                F.lit("{}").alias("props"),
            ).coalesce(1).write.mode("overwrite").parquet(
                _os.path.join(d, "events.parquet")
            )

        _write(rows)
        out = {
            r["key_name"]: r
            for r in extensions_r20.x210_key_skew_certificate(
                spark, d
            ).collect()
        }
        u = out["user_id"]
        assert u["n_keys"] == 4 and u["n_rows"] == 100
        assert u["max_cnt"] == 25 and u["mean_cnt"] == 25
        assert u["skew_ppm"] == 1_000_000
        assert u["hhi_ppm"] == 250_000  # 10^6 / 4
        # hot key: user 9 gets 98 rows, users 8 and 7 one each
        hot = [(i, 9, "view") for i in range(98)] + [
            (98, 8, "view"), (99, 7, "view")
        ]
        _write(hot)
        out = {
            r["key_name"]: r
            for r in extensions_r20.x210_key_skew_certificate(
                spark, d
            ).collect()
        }
        u = out["user_id"]
        assert u["n_keys"] == 3 and u["max_cnt"] == 98
        assert u["skew_ppm"] == 2_940_000
        assert u["hhi_ppm"] == 960_600
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_key_skew_corpus_reads_the_bad_key(spark):
    """The 5-value event_type key must read near-uniform fair-share
    hhi (~10^6/5) but the certificate still shows user_id spreading
    400x wider; skew_ppm >= 10^6 always (max >= mean)."""
    out = {
        r["key_name"]: r
        for r in extensions_r20.x210_key_skew_certificate(
            spark, SF01
        ).collect()
    }
    et, uid = out["event_type"], out["user_id"]
    assert et["n_keys"] == 5
    assert uid["n_keys"] == 150
    for r in (et, uid):
        assert r["skew_ppm"] >= 1_000_000
        assert 0 < r["hhi_ppm"] <= 1_000_000
    assert 190_000 <= et["hhi_ppm"] <= 220_000  # ~1/5
    assert uid["hhi_ppm"] < et["hhi_ppm"]       # 150 keys spread
