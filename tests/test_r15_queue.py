"""Staged certification for the round-15 queue
(queries/extensions_r15.py — x176 inter-arrival CV2, x177 duplication
profile, x178 centroid drift, x179 top-k churn, s27 streaming Gini).
Staged three rounds ahead; same local gate as the r10-r14 queues: the
check_oracle differential at sf0.001 AND sf0.01, hand pins, vacuity
audits, and the stream==batch identity for s27."""

from __future__ import annotations

import importlib.util
import os
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r15
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


@pytest.mark.parametrize("name", sorted(extensions_r15.QUERIES))
def test_differential_vs_duckdb(spark, name):
    sdf = extensions_r15.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r15.ORACLES[name]).arrow()
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


@pytest.mark.parametrize("name", sorted(extensions_r15.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    sdf = extensions_r15.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r15.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


# ------------------------------------------------------- x176 pins


def _cv2_of_gaps(spark, gaps):
    """Run the x176 aggregation arithmetic on a planted gap list."""
    df = spark.createDataFrame(
        [("k", g) for g in gaps], "event_type string, g long"
    )
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("g").alias("sg"),
            F.sum(F.col("g") * F.col("g")).alias("sg2"),
        )
        .select(
            F.expr(
                "CASE WHEN sg > 0 THEN"
                " (1000000 * (n_gaps * sg2 - sg * sg))"
                " DIV (sg * sg) END"
            ).alias("cv2_ppm")
        )
        .collect()[0]["cv2_ppm"]
    )


def test_cv2_constant_gaps_is_zero(spark):
    """A metronome has zero gap variance: CV2 exactly 0."""
    assert _cv2_of_gaps(spark, [4, 4, 4, 4]) == 0


def test_cv2_alternating_gaps_is_one(spark):
    """Gaps alternating 0/8: var_num = n*sg2 - sg^2 = 4*256 - 256 =
    768... hand-check: n=4, sg=16, sg2=128 -> var_num = 512-256 = 256;
    cv2 = 1e6*256/256 = exactly 1e6 (CV^2 = 1, the Poisson line)."""
    assert _cv2_of_gaps(spark, [0, 8, 0, 8]) == 1_000_000


def test_interarrival_fixture_nondegenerate(spark):
    out = extensions_r15.x176_interarrival_cv2(spark, SF01).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_gaps"] > 0 and r["var_num"] >= 0
        assert r["cv2_ppm"] is not None and r["cv2_ppm"] >= 0
    assert len({r["cv2_ppm"] for r in out}) > 1


# ------------------------------------------------------- x177 pins


def test_dup_profile_mass_matches_clusters(spark):
    """Σ size·n_clusters over the histogram == clustered-doc count
    from the certified cluster operator, sizes all >= 2, and the
    log-log tail slope is strictly negative (bigger dup families are
    rarer in the fixture)."""
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from m5_competition_kaggle_spark.operators.graph import (
        dedup_clusters,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table

    out = extensions_r15.x177_dup_cluster_profile(
        spark, SF
    ).collect()
    assert out and all(r["size"] >= 2 for r in out)
    docs = load_table(spark, SF, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.8,
    ).select("id_a", "id_b")
    n_clustered = dedup_clusters(pairs).count()
    assert sum(r["size"] * r["n_clusters"] for r in out) == n_clustered
    assert all(r["n_sizes"] == len(out) for r in out)
    if len(out) >= 2:
        assert out[0]["tail_slope_ppm"] < 0


def test_dup_profile_slope_null_with_one_size(spark):
    """The histogram survives when the slope is undefined: a planted
    two-cluster corpus with ONE distinct size keeps its row and NULLs
    the slope (the left-join guard)."""
    from m5_competition_kaggle_spark.operators.graph import (
        dedup_clusters,
    )
    from m5_competition_kaggle_spark.operators.theil_sen import (
        theil_sen_slope,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (10, 11)], "id_a long, id_b long"
    )
    hist = (
        dedup_clusters(pairs)
        .filter(F.col("is_canonical"))
        .groupBy(F.col("cluster_size").alias("size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
    )
    pts = hist.select(
        F.lit("corpus").alias("corpus"),
        F.expr("CAST(round(ln(size) * 1000000) AS BIGINT)").alias(
            "lt"
        ),
        F.expr(
            "CAST(round(ln(n_clusters) * 1000000) AS BIGINT)"
        ).alias("ly"),
    )
    slope = theil_sen_slope(pts, "corpus", "lt", "ly").select(
        F.col("n").alias("n_sizes"),
        F.col("slope_ppm").alias("tail_slope_ppm"),
    )
    rows = (
        hist.join(F.broadcast(slope), F.lit(True), "left")
        .select("size", "n_clusters", "n_sizes", "tail_slope_ppm")
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["size"] == 2 and rows[0]["n_clusters"] == 2
    assert rows[0]["tail_slope_ppm"] is None


# ------------------------------------------------------- x178 pins


def test_centroid_drift_identical_halves_is_zero(spark):
    """Kernel identity on planted sums: equal floored centroids =>
    shift_sq == 0 regardless of counts (the permille floor is what
    makes 'identical distribution, different n' exact)."""
    from m5_competition_kaggle_spark.operators.centroid import (
        centroid_sums,
    )

    # even ids get vector v, odd ids the same v: halves identical
    v = [0.123, -0.456, 0.789]
    emb = spark.createDataFrame(
        [(i, 7, v) for i in range(6)],
        "vec_id long, label int, embedding array<float>",
    )
    sign_div = (
        "CASE WHEN {s} >= 0 THEN (1000 * {s}) DIV {n}"
        " ELSE -(((-{s}) * 1000) DIV {n}) END"
    )
    even = centroid_sums(emb.filter(F.col("vec_id") % 2 == 0)).select(
        "label", "pos",
        F.expr(sign_div.format(s="sum_q", n="n_vectors")).alias("ce"),
    )
    odd = centroid_sums(emb.filter(F.col("vec_id") % 2 == 1)).select(
        "label", "pos",
        F.expr(sign_div.format(s="sum_q", n="n_vectors")).alias("co"),
    )
    rows = even.join(odd, ["label", "pos"]).collect()
    assert len(rows) == 3
    assert all(r["ce"] == r["co"] for r in rows)


def test_centroid_drift_sign_division_truncates(spark):
    """The negative-component floor must truncate toward zero in BOTH
    engines: sum_q = -5 over n = 2 gives c = -(5000 DIV 2) = -2500,
    and a hand case that floor-division would get wrong: sum_q = -1,
    n = 3 -> -(1000 DIV 3) = -333 (floor would say -334)."""
    df = spark.createDataFrame(
        [(-5, 2), (-1, 3), (1, 3)], "s long, n long"
    )
    got = sorted(
        r["c"]
        for r in df.select(
            F.expr(
                "CASE WHEN s >= 0 THEN (1000 * s) DIV n"
                " ELSE -(((-s) * 1000) DIV n) END"
            ).alias("c")
        ).collect()
    )
    assert got == [-2500, -333, 333]
    con = duckdb.connect()
    duck = sorted(
        r[0]
        for r in con.sql(
            "SELECT CASE WHEN s >= 0 THEN (1000 * s) // n"
            " ELSE -(((-s) * 1000) // n) END AS c"
            " FROM (VALUES (-5, 2), (-1, 3), (1, 3)) AS t(s, n)"
        ).fetchall()
    )
    assert duck == got


def test_centroid_drift_fixture_shape(spark):
    out = extensions_r15.x178_centroid_drift(spark, SF01).collect()
    assert len(out) == 10  # every label present in both halves
    for r in out:
        assert r["n_even"] > 0 and r["n_odd"] > 0
        assert r["shift_sq"] >= 0 and r["norm_sq_even"] > 0
        assert r["ratio_ppm"] is not None
    # halves of a label-coherent corpus drift, but far less than the
    # centroid magnitude itself
    assert any(r["shift_sq"] > 0 for r in out)


# ------------------------------------------------------- x179 pins


def test_topk_churn_bounds(spark):
    out = extensions_r15.x179_topk_churn(spark, SF01).collect()
    assert len(out) >= 25  # ~30 consecutive-day pairs in the window
    for r in out:
        assert 0 < r["n_prev"] <= 20 and 0 < r["n_cur"] <= 20
        assert 0 <= r["n_common"] <= min(r["n_prev"], r["n_cur"])
        assert 0 <= r["jaccard_permille"] <= 1000


# ------------------------------------------- gini cells refactor


def test_gini_cells_equals_rows(spark):
    """gini_by_group == gini_from_cells on hand-built cells — the
    wrapper relationship the s27 twin leans on."""
    from m5_competition_kaggle_spark.operators.gini import (
        gini_by_group,
        gini_from_cells,
    )

    vals = [0, 0, 3, 3, 3, 9, 20]
    rows = gini_by_group(
        spark.createDataFrame(
            [("g", v) for v in vals], "grp string, v long"
        ),
        ["grp"],
        "v",
    ).collect()
    from collections import Counter

    cells = spark.createDataFrame(
        [("g", q, c) for q, c in Counter(vals).items()],
        "grp string, q long, c long",
    )
    cell_rows = gini_from_cells(cells, ["grp"]).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in cell_rows]


# ---------------------------------------------- s27 stream == batch


def test_stream_gini_equals_batch_trajectory(spark):
    """The file-source streaming Gini monitor must emit the identical
    per-day table as the certified batch twin (s27), including when
    the files arrive as separate triggers."""
    from m5_competition_kaggle_spark.queries.extensions_r15 import (
        s27_stream_gini,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table
    from m5_competition_kaggle_spark.streaming.gini_monitor import (
        streaming_gini_trajectory,
    )

    ev = load_table(spark, SF, "events")
    expected = sorted(
        tuple((str(v) if hasattr(v, "year") else v) for v in r)
        for r in s27_stream_gini(spark, SF).collect()
    )
    assert expected, "batch twin produced no rows"

    d = tempfile.mkdtemp(prefix="events_gini_stream_")
    ckpt = tempfile.mkdtemp(prefix="gini_ckpt_")
    sink: list = []
    try:
        mid = ev.approxQuantile("ts_nanos", [0.5], 0.0)[0]
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
        q = streaming_gini_trajectory(
            spark, d, sink, ckpt, maxFilesPerTrigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            tuple((str(v) if hasattr(v, "year") else v) for v in r)
            for r in sink
        )
        assert got == expected
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_interarrival_day_cell_decomposition_equivalence(spark):
    """r13 scale rework: the (key, day)-windowed intra-day gaps plus
    the day-cell boundary lag must reproduce the single ordered
    walk's gap multiset EXACTLY — pinned on a planted series with
    multi-day empty stretches, a midnight-straddling pair, same-
    nanosecond ties, and a day with a single event (no intra gaps,
    two boundary gaps). Reference: brute-force python over the
    sorted timeline."""
    import itertools
    import os
    import shutil
    import tempfile

    NS_DAY = 86_400_000_000_000
    NS_MIN = 60_000_000_000
    base = 19_000 * NS_DAY
    tss = [
        base + 1,
        base + 1,                      # same-nanosecond tie
        base + 5 * NS_MIN,
        base + NS_DAY - 1,             # last event of day 0
        base + NS_DAY + 1,             # first event of day 1 (straddle)
        base + 3 * NS_DAY + 7,         # two empty days, then a
                                       # single-event day
        base + 6 * NS_DAY + 11,        # another empty stretch
        base + 6 * NS_DAY + 90 * NS_MIN,
    ]
    rows = [
        (i, ts, 1, "k", 1.0, "{}") for i, ts in enumerate(tss)
    ]
    d = tempfile.mkdtemp(prefix="x176_decomp_")
    try:
        spark.createDataFrame(
            rows,
            "event_id long, __ns long, user_id long,"
            " event_type string, value double, props string",
        ).select(
            "event_id",
            # integer DIV, not /: float division rounds 1641686399999999.999
            # micros UP, silently moving the event across the midnight
            # boundary this test plants
            F.timestamp_micros(F.expr("__ns DIV 1000")).alias("ts"),
            "user_id", "event_type", "value", "props",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        out = extensions_r15.x176_interarrival_cv2(spark, d).collect()
        assert len(out) == 1
        # brute force on the micro-truncated timestamps the parquet
        # actually stores (timestamp_micros floors the nanos)
        micros = sorted(ns // 1000 for ns in tss)
        gaps = [
            ((b - a) * 1000) // NS_MIN
            for a, b in itertools.pairwise(micros)
        ]
        n, sg = len(gaps), sum(gaps)
        sg2 = sum(g * g for g in gaps)
        r = out[0]
        assert r["n_gaps"] == n
        assert r["sum_gap_min"] == sg
        assert r["var_num"] == n * sg2 - sg * sg
        assert r["mean_gap_min"] == sg // n
        assert r["cv2_ppm"] == (
            1_000_000 * (n * sg2 - sg * sg)
        ) // (sg * sg)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ------------------------------------------------------- x205 pins


def _write_embeddings_x205(spark, rows, d):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )


def test_embedding_health_planted_dead_dim(spark):
    """Three 64-dim vectors whose dim 7 is constant 0.5 and dim 9 is
    constant 0.0: both flagged dead; a varying dim is not; hand
    moments check the quantized arithmetic (q = round(x*1000))."""
    import random

    rng = random.Random(205)
    rows = []
    for vid in range(3):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        v[7] = 0.5
        v[9] = 0.0
        v[0] = float(vid)  # 0.0, 1.0, 2.0 -> q = 0, 1000, 2000
        rows.append((vid, v, "a"))
    d = tempfile.mkdtemp(prefix="x205_dead_")
    try:
        _write_embeddings_x205(spark, rows, d)
        out = {
            r["dim"]: r
            for r in extensions_r15.x205_embedding_health(
                spark, d
            ).collect()
        }
        assert len(out) == 64
        assert out[7]["is_dead"] == 1
        assert out[7]["min_q"] == out[7]["max_q"] == 500
        assert out[9]["is_dead"] == 1
        assert out[9]["min_q"] == out[9]["max_q"] == 0
        assert out[0]["is_dead"] == 0
        assert out[0]["n"] == 3
        assert out[0]["sum_q"] == 3000          # 0 + 1000 + 2000
        assert out[0]["sumsq_q"] == 5_000_000   # 0 + 10^6 + 4*10^6
        assert out[0]["min_q"] == 0
        assert out[0]["max_q"] == 2000
        dead = [r["dim"] for r in out.values() if r["is_dead"] == 1]
        assert set(dead) == {7, 9}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_embedding_health_corpus_sanity(spark):
    """Real corpus at sf0.01: exactly 64 rows, no dead dims (the
    generator fills every dim), moments satisfy the Cauchy-Schwarz
    bound n*sumsq >= sum^2."""
    out = extensions_r15.x205_embedding_health(
        spark, SF01
    ).collect()
    assert len(out) == 64
    for r in out:
        assert r["is_dead"] == 0
        assert r["n"] * r["sumsq_q"] >= r["sum_q"] ** 2
        assert r["min_q"] < r["max_q"]
