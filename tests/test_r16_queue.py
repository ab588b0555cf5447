"""Staged certification for the round-16 queue
(queries/extensions_r16.py — x180 entropy rate, x181 runs test, x182
label margin, x183 conversion lag, s28 stateful transitions). Staged
four rounds ahead; same local gate as the r10-r15 queues: the
check_oracle differential at sf0.001 AND sf0.01, hand pins, vacuity
audits, and the cross-micro-batch stateful identity for s28."""

from __future__ import annotations

import importlib.util
import os
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r16
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


@pytest.mark.parametrize("name", sorted(extensions_r16.QUERIES))
def test_differential_vs_duckdb(spark, name):
    sdf = extensions_r16.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r16.ORACLES[name]).arrow()
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


@pytest.mark.parametrize("name", sorted(extensions_r16.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    sdf = extensions_r16.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r16.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


# ------------------------------------------------------- x180 pins


def test_entropy_rate_counts_every_surprisal_micronat(spark):
    """The x171 identity: per-timeline surprisal and per-state
    conditional entropy count the SAME micro-nats — Σ_users
    sum_surprisal == Σ_states h_num, exactly."""
    from m5_competition_kaggle_spark.operators.markov import (
        transition_surprisal,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table

    ev = load_table(spark, SF01, "events")
    user_total = (
        transition_surprisal(
            ev, "user_id", "event_type", ("ts_nanos", "event_id")
        )
        .agg(F.sum("sum_surprisal_unat"))
        .collect()[0][0]
    )
    rows = extensions_r16.x180_entropy_rate(spark, SF01).collect()
    assert sum(r["h_num"] for r in rows) == user_total
    # rate is the frequency-weighted mean of per-state entropies
    n_trans = sum(r["c_a"] for r in rows)
    assert rows[0]["rate_unat"] == sum(
        r["h_num"] for r in rows
    ) // n_trans
    assert len({r["rate_unat"] for r in rows}) == 1


def test_entropy_deterministic_chain_is_zero(spark):
    """A one-successor-per-state grammar has H(next|state) == 0."""
    from m5_competition_kaggle_spark.operators.markov import (
        transition_pairs,
    )

    rows = [("u", i, "XYZ"[i % 3]) for i in range(12)]
    df = spark.createDataFrame(rows, "k string, t long, s string")
    pairs = transition_pairs(df, "k", "s", ("t",))
    cab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    ca = cab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    h = (
        cab.join(ca, "a")
        .select(
            (
                F.col("c_ab")
                * F.expr(
                    "CAST(round(ln(c_a) * 1000000) AS BIGINT)"
                    " - CAST(round(ln(c_ab) * 1000000) AS BIGINT)"
                )
            ).alias("term")
        )
        .agg(F.sum("term"))
        .collect()[0][0]
    )
    assert h == 0


# ------------------------------------------------------- x181 pins


def _runs_of(spark, ys):
    """Run the x181 move/runs arithmetic on a planted daily series."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [("k", t, y) for t, y in enumerate(ys)],
        "event_type string, t long, y long",
    )
    w = Window.partitionBy("event_type").orderBy("t")
    moves = (
        df.withColumn("diff", F.col("y") - F.lag("y").over(w))
        .filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
        .select(
            "event_type", "t",
            F.when(F.col("diff") > 0, F.lit(1))
            .otherwise(F.lit(-1)).alias("mv"),
        )
    )
    runs = moves.withColumn(
        "new_run",
        F.when(
            F.lag("mv").over(w).isNull()
            | (F.lag("mv").over(w) != F.col("mv")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    r = runs.groupBy("event_type").agg(
        F.sum(F.when(F.col("mv") == 1, 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("mv") == -1, 1).otherwise(0)).alias("nm"),
        F.sum("new_run").alias("runs"),
    ).collect()
    return (r[0]["np"], r[0]["nm"], r[0]["runs"]) if r else (0, 0, 0)


def test_runs_monotone_series_is_one_run(spark):
    np_, nm, runs = _runs_of(spark, [1, 2, 5, 9, 14])
    assert (np_, nm, runs) == (4, 0, 1)


def test_runs_alternating_series_is_all_runs(spark):
    np_, nm, runs = _runs_of(spark, [5, 9, 2, 9, 2, 9])
    assert np_ == 3 and nm == 2 and runs == 5


def test_runs_zero_moves_drop(spark):
    np_, nm, runs = _runs_of(spark, [4, 4, 7, 7, 3])
    assert (np_, nm, runs) == (1, 1, 2)


def test_runs_fixture_bounds(spark):
    out = extensions_r16.x181_runs_test(spark, SF01).collect()
    assert len(out) == 5
    for r in out:
        n = r["n_plus"] + r["n_minus"]
        assert 1 <= r["runs"] <= n
        assert 1000 <= r["expected_milli"] <= 1000 + 1000 * n
        assert r["var_num"] >= 0 and r["var_den"] > 0


# ------------------------------------------------------- x182 pins


def test_label_margin_fixture_separability(spark):
    """The fixture's labels are WEAKLY separable (the audit's honest
    finding — most vectors sit closer to some other centroid than
    their own), so the pin is nondegeneracy: both rank-safe and
    misranked vectors exist, and the ordering identities hold."""
    out = extensions_r16.x182_label_margin(spark, SF01).collect()
    assert len(out) == 10
    assert sum(r["n_vectors"] for r in out) == 500
    for r in out:
        assert r["min_margin"] <= r["mean_margin"] <= r["max_margin"]
        assert 0 <= r["n_misranked"] <= r["n_vectors"]
    n_mis = sum(r["n_misranked"] for r in out)
    assert 0 < n_mis < 500  # neither perfectly safe nor hopeless


def test_label_margin_agrees_with_confusion_diagonal(spark):
    """Strict misranking (margin < 0) can never exceed the
    off-diagonal confusion count, and rank-safety (margin > 0) can
    never exceed the diagonal — the tie band is the only slack."""
    from m5_competition_kaggle_spark.operators.centroid import (
        centroid_confusion,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table

    emb = load_table(spark, SF01, "embeddings")
    conf = centroid_confusion(emb).collect()
    off_diag = sum(
        r["n"] for r in conf if r["true_label"] != r["pred_label"]
    )
    out = extensions_r16.x182_label_margin(spark, SF01).collect()
    assert sum(r["n_misranked"] for r in out) <= off_diag


# ------------------------------------------------------- x183 pins


def test_conversion_lag_fixture_sanity(spark):
    r = extensions_r16.x183_conversion_lag(spark, SF01).collect()[0]
    assert 0 < r["n_converted"] <= r["n_viewers"]
    assert 0 <= r["conversion_ppm"] <= 1_000_000
    assert 0 <= r["min_lag_min"] <= r["mean_lag_min"] \
        <= r["max_lag_min"]


def test_conversion_lag_excludes_purchase_before_view(spark):
    """A user whose only purchase PRECEDES their first view is not a
    conversion (the p0 >= v0 guard)."""
    df = spark.createDataFrame(
        [(900, 1000), (1000, 900), (1000, None), (None, 900)],
        "v0 long, p0 long",
    )
    got = df.select(
        F.expr(
            "CASE WHEN v0 IS NOT NULL AND p0 IS NOT NULL"
            " AND p0 >= v0 THEN (p0 - v0) DIV 60000000000 END"
        ).alias("lag_min")
    ).collect()
    assert [r["lag_min"] for r in got] == [0, None, None, None]


# ---------------------------------------------------- s28 identity


def test_s28_marginal_is_g18(spark):
    """Summing the day-resolved matrix over days must reproduce the
    corpus-total transition counts from the pure-SQL lag window."""
    from m5_competition_kaggle_spark.operators.markov import (
        transition_pairs,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table

    ev = load_table(spark, SF, "events")
    expected = {
        (r["a"], r["b"]): r["n"]
        for r in transition_pairs(
            ev, "user_id", "event_type", ("ts_nanos", "event_id")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got: dict = {}
    for r in extensions_r16.s28_stateful_transitions(
        spark, SF
    ).collect():
        k = (r["a"], r["b"])
        got[k] = got.get(k, 0) + r["n"]
    assert got == expected


def test_s28_stream_pairs_straddle_microbatches(spark):
    """The applyInPandasWithState twin must emit EVERY pair exactly
    once across a two-file stream split mid-corpus — including the
    pairs whose two events land in different micro-batches (the
    GroupState carry). Aggregated emissions == the certified batch
    matrix."""
    from m5_competition_kaggle_spark.sources.catalog import load_table
    from m5_competition_kaggle_spark.streaming.events import (
        read_events_stream,
    )
    from m5_competition_kaggle_spark.streaming.transition_state import (
        stateful_transitions,
    )

    ev = load_table(spark, SF, "events")
    expected = sorted(
        tuple(r)
        for r in extensions_r16.s28_stateful_transitions(
            spark, SF
        ).collect()
    )
    mid = ev.approxQuantile("ts_nanos", [0.5], 0.0)[0]
    # the split must strand at least one pair across the boundary
    n_straddle = (
        ev.filter(F.col("ts_nanos") < mid)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n1"))
        .join(
            ev.filter(F.col("ts_nanos") >= mid)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n2")),
            "user_id",
        )
        .count()
    )
    assert n_straddle > 0

    d = tempfile.mkdtemp(prefix="events_trans_stream_")
    ckpt = tempfile.mkdtemp(prefix="trans_ckpt_")
    try:
        for name, part in (
            ("a", ev.filter(F.col("ts_nanos") < mid)),
            ("b", ev.filter(F.col("ts_nanos") >= mid)),
        ):
            tmp = os.path.join(d, f"__{name}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            for f in os.listdir(tmp):
                if f.endswith(".parquet"):
                    shutil.move(
                        os.path.join(tmp, f),
                        os.path.join(d, f"part-{name}.parquet"),
                    )
            shutil.rmtree(tmp)
        stream = read_events_stream(
            spark, d, maxFilesPerTrigger=1
        ).select(
            "user_id",
            F.col("ts_nanos").alias("tsn"),
            "event_id",
            "event_type",
        )
        out = stateful_transitions(stream)
        q = (
            out.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("memory")
            .queryName("s28_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            tuple(r)
            for r in spark.sql(
                "SELECT day, a, b, CAST(count(*) AS LONG) AS n"
                " FROM s28_out GROUP BY day, a, b"
            ).collect()
        )
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.catalog.dropTempView("s28_out")


# ------------------------------------------------------- x206 pins


def test_watermark_audit_hand_walked(spark):
    """Planted arrival sequence with hand-computed lateness: arrival
    order (event_id) carries event times [t0, t0+5m, t0+1m, t0+10m,
    t0-2m] -> high-water [t0, +5m, +5m, +10m, +10m] -> lateness
    minutes [0, 0, 4, 0, 12]. n_late=2; minute cells {0:3, 4:1,
    12:1}: p50 = 0 (cum 3 >= ceil(5*50/100)=3), p95 = p99 = 12,
    max = 12."""
    import os as _os
    import shutil
    import tempfile

    t0 = 1_704_067_200_000_000_000
    m = 60_000_000_000
    seq = [t0, t0 + 5 * m, t0 + 1 * m, t0 + 10 * m, t0 - 2 * m]
    rows = [(i, ns, 1, "view") for i, ns in enumerate(seq)]
    d = tempfile.mkdtemp(prefix="x206_hand_")
    try:
        spark.createDataFrame(
            rows,
            "event_id long, __ns long, user_id long,"
            " event_type string",
        ).select(
            "event_id",
            F.timestamp_micros(
                (F.col("__ns") / 1000).cast("long")
            ).alias("ts"),
            "user_id",
            "event_type",
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        ).coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(d, "events.parquet")
        )
        r = extensions_r16.x206_watermark_audit(
            spark, d
        ).collect()[0]
        assert r["n_events"] == 5
        assert r["n_late"] == 2
        assert r["p50_min"] == 0
        assert r["p95_min"] == 12
        assert r["p99_min"] == 12
        assert r["max_lateness_min"] == 12
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_watermark_audit_corpus_invariants(spark):
    """Real corpus at sf0.01: quantiles monotone and HONEST FIXTURE
    FINDING pinned — the generator assigns event_id in timestamp
    order, so the replayed stream is perfectly in-order and the audit
    correctly reads zero lateness everywhere (watermark 0: nothing
    would drop). The hand-walked planted test above is where nonzero
    lateness arithmetic is exercised."""
    r = extensions_r16.x206_watermark_audit(spark, SF01).collect()[0]
    assert r["n_events"] == 10_000
    assert r["n_late"] == 0
    assert (
        r["p50_min"]
        == r["p95_min"]
        == r["p99_min"]
        == r["max_lateness_min"]
        == 0
    )
