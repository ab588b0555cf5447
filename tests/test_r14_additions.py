"""Hand pins and degenerate-input guards for the six queries staged
during round 14 (x211 weekly spectrum → r16 queue, x212 JL distortion
→ r15, x213 mutual information → r17, x214 KM return-time hazard →
r18, x216 Benford digits → r19, x215 MAD outliers → r20). The
Spark-vs-DuckDB differential at sf0.001 AND sf0.01 runs in each
round's queue test via the QUERIES-dict parametrization; these are
the closed-form plants the differential can't provide (it proves the
engines AGREE; the plants prove they agree on the RIGHT answer)."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import (
    extensions_r15,
    extensions_r16,
    extensions_r17,
    extensions_r18,
    extensions_r19,
    extensions_r20,
)

NS_PER_DAY = 86_400_000_000_000
NS_PER_HOUR = 3_600_000_000_000
# 2024-01-01 00:00 UTC — epoch day 19723 (19723 % 7 == 4).
T0_DAY = 19723


def _write_events(spark, rows, d):
    """rows: (event_id, epoch_nanos, user_id, event_type, value)."""
    spark.createDataFrame(
        rows,
        "event_id long, __ns long, user_id long,"
        " event_type string, value double",
    ).select(
        "event_id",
        F.timestamp_micros(
            (F.col("__ns") / 1000).cast("long")
        ).alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )


def _write_embeddings(spark, vecs, d):
    """vecs: (vec_id, list[float] of len 64)."""
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).withColumn("label", F.lit(0)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "embeddings.parquet"))


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="r14_additions_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# ------------------------------------------------------------- x211


def test_weekly_spectrum_spike_train_closed_form(spark, tdir):
    """A pure period-7 spike train concentrates ALL its energy in the
    weekly bin: every active day shares one phase r0, so
    sc = A·k·C7[r0], ss = A·k·S7[r0] and weekly_power_ppm reduces to
    C7[r0]² + S7[r0]² exactly (= 10⁶ at r0 = 0 up to the quantized
    table; 999653 at the phase used here) — independent of amplitude
    and week count."""
    rows = []
    # 6 spikes, one per week, all at day ≡ T0_DAY+1 (phase r0 = 5)
    for k in range(6):
        day = T0_DAY + 1 + 7 * k
        rows.append((k, day * NS_PER_DAY, 1, "view", 100.0))
    _write_events(spark, rows, tdir)
    out = extensions_r16.x211_weekly_spectrum(spark, tdir).collect()
    assert len(out) == 1
    r = out[0]
    r0 = (T0_DAY + 1) % 7
    c, s = (
        extensions_r16._C7[r0],
        extensions_r16._S7[r0],
    )
    assert r["n_days"] == 6
    assert r["sum_y"] == 600
    assert r["sc"] == 600 * c and r["ss"] == 600 * s
    assert r["weekly_power_ppm"] == c * c + s * s


def test_weekly_spectrum_flat_series_near_zero(spark, tdir):
    """A constant daily series has (near-)zero weekly power: over
    whole weeks Σc = −2 and Σs = 0 in the quantized table, so the
    ratio is ~0 ppm (the table's rounding residual), nowhere near a
    real weekly cycle's reading."""
    rows = []
    for k in range(28):  # 4 whole weeks, constant y = 100
        rows.append((k, (T0_DAY + k) * NS_PER_DAY, 1, "view", 100.0))
    _write_events(spark, rows, tdir)
    r = extensions_r16.x211_weekly_spectrum(spark, tdir).collect()[0]
    assert r["sc"] == 100 * 4 * sum(extensions_r16._C7)
    assert r["ss"] == 0
    assert r["weekly_power_ppm"] == 0


def test_weekly_spectrum_zero_mass_null(spark, tdir):
    """Values that all round to 0 leave sum_y = 0 — the ratio is NULL
    (guarded), not a division error."""
    rows = [(0, T0_DAY * NS_PER_DAY, 1, "view", 0.2)]
    _write_events(spark, rows, tdir)
    r = extensions_r16.x211_weekly_spectrum(spark, tdir).collect()[0]
    assert r["sum_y"] == 0 and r["weekly_power_ppm"] is None


# ------------------------------------------------------------- x212


def test_jl_distortion_single_axis_pairs_exact(spark, tdir):
    """Vectors differing in exactly ONE dimension by δ pin the ±1
    projection algebra: d64 = δ² and every output dim moves by
    ±δ, so d8 = 8·δ² and ratio_ppm = 10⁶ exactly → every pair lands
    in bucket 4 (10⁶ DIV 250000)."""
    # vec k = zeros except dim 0 = 0.1·k — consecutive pairs differ
    # in exactly one dimension by δ = 0.1 (100 millis)
    vecs = [
        (k, [0.1 * k if i == 0 else 0.0 for i in range(64)])
        for k in range(5)
    ]
    _write_embeddings(spark, vecs, tdir)
    out = extensions_r15.x212_jl_distortion(spark, tdir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bucket"] == 4
    assert r["n_pairs"] == 4
    # δ_k = 100 millis between k-1 and k → d64 = 100², sum over 4
    assert r["sum_d64"] == 4 * 100 * 100
    assert r["sum_d8"] == 8 * 4 * 100 * 100


def test_jl_distortion_identical_and_empty(spark, tdir):
    """Identical consecutive vectors (d64 = 0) are excluded; a
    single-vector corpus has no pairs — both yield well-formed empty
    results."""
    _write_embeddings(
        spark, [(0, [1.0] * 64), (1, [1.0] * 64)], tdir
    )
    assert (
        extensions_r15.x212_jl_distortion(spark, tdir).count() == 0
    )
    _write_embeddings(spark, [(0, [1.0] * 64)], tdir)
    assert (
        extensions_r15.x212_jl_distortion(spark, tdir).count() == 0
    )


def test_jl_signs_are_h64_derived(spark):
    """The sign table is pinned to the portable hash — a drifted
    regeneration (different seed string, different parity rule)
    fails here, because the oracle embeds these exact literals."""
    from m5_competition_kaggle_spark.functions.text import h64_py

    for j in (0, 7):
        for i in (0, 63):
            expect = 1 if h64_py(f"jl:{i}:{j}") % 2 == 0 else -1
            assert extensions_r15._JL_SIGNS[j][i] == expect


# ------------------------------------------------------------- x213


def test_mutual_information_exact_independence_is_zero(spark, tdir):
    """Counts in exact product form (type ⟂ hour) make every term
    L(N·c_ah) − L(c_a·c_h) literally zero — integer MI certifies
    independence with no tolerance: type A {10@h0, 20@h1}, type B
    {30@h0, 60@h1} → N·c_ah = c_a·c_h in every cell."""
    rows = []
    eid = 0
    for a, h, n in (
        ("alpha", 0, 10),
        ("alpha", 1, 20),
        ("beta", 0, 30),
        ("beta", 1, 60),
    ):
        for k in range(n):
            eid += 1
            ns = T0_DAY * NS_PER_DAY + h * NS_PER_HOUR + k * 1000
            rows.append((eid, ns, 1, a, 1.0))
    _write_events(spark, rows, tdir)
    out = extensions_r17.x213_mutual_information(
        spark, tdir
    ).collect()
    assert [(r["event_type"], r["mi_num"]) for r in out] == [
        ("alpha", 0),
        ("beta", 0),
    ]
    assert out[0]["total_mi_num"] == 0


def test_mutual_information_disjoint_hours_closed_form(spark, tdir):
    """Perfect dependence (each type owns one hour) pins the micro-nat
    arithmetic against the same formula in Python bigints."""
    rows = []
    eid = 0
    for a, h, n in (("alpha", 0, 12), ("beta", 1, 36)):
        for k in range(n):
            eid += 1
            ns = T0_DAY * NS_PER_DAY + h * NS_PER_HOUR + k * 1000
            rows.append((eid, ns, 1, a, 1.0))
    _write_events(spark, rows, tdir)
    out = extensions_r17.x213_mutual_information(
        spark, tdir
    ).collect()
    N = 48

    def L(x: float) -> int:
        return round(math.log(x) * 1_000_000)

    expect = {
        "alpha": 12 * (L(float(N) * 12) - L(12.0 * 12)),
        "beta": 36 * (L(float(N) * 36) - L(36.0 * 36)),
    }
    got = {r["event_type"]: r["mi_num"] for r in out}
    assert got == expect
    assert out[0]["total_mi_num"] == sum(expect.values())


# ------------------------------------------------------------- x214


def test_km_return_hazard_closed_form(spark, tdir):
    """Three users with hand-laid visit days pin risk sets, hazards
    and the product-limit survival: A visits d0,d0+1; B visits
    d0,d0+3; C visits d0 only; t_max = d0+3. Spells: observed {1, 3},
    censored {2, 3, 0}. Death times: t=1 (n_risk 4, h=1/4) and t=3
    (n_risk 2, h=1/2)."""
    rows = [
        (1, T0_DAY * NS_PER_DAY, 1, "view", 1.0),
        (2, (T0_DAY + 1) * NS_PER_DAY, 1, "view", 1.0),
        (3, T0_DAY * NS_PER_DAY, 2, "view", 1.0),
        (4, (T0_DAY + 3) * NS_PER_DAY, 2, "view", 1.0),
        (5, T0_DAY * NS_PER_DAY, 3, "view", 1.0),
    ]
    _write_events(spark, rows, tdir)
    out = extensions_r18.x214_km_hazard(spark, tdir).collect()
    got = [
        (
            r["dur_days"],
            r["n_risk"],
            r["n_returns"],
            r["hazard_ppm"],
            r["surv_ppm"],
        )
        for r in out
    ]
    assert got == [
        (1, 4, 1, 250000, 750000),
        (3, 2, 1, 500000, 375000),
    ]


def test_km_return_hazard_single_visit_users_empty(spark, tdir):
    """Every user seen once → only censored spells → no death rows;
    well-formed empty output, not an error."""
    rows = [
        (1, T0_DAY * NS_PER_DAY, u, "view", 1.0)
        for u in range(1, 4)
    ]
    _write_events(spark, rows, tdir)
    assert extensions_r18.x214_km_hazard(spark, tdir).count() == 0


# ------------------------------------------------------------- x215


def test_mad_outliers_closed_form(spark, tdir):
    """Values (1,1,1,5,9,9,9)·10⁻³ per the milli grid: n = 7, lower
    median = 4th smallest = 5, deviations (4,4,4,0,4,4,4) → MAD = 4,
    fence 12 → 0 outliers."""
    vals = [0.001, 0.001, 0.001, 0.005, 0.009, 0.009, 0.009]
    rows = [
        (i, T0_DAY * NS_PER_DAY + i, 1, "view", v)
        for i, v in enumerate(vals)
    ]
    _write_events(spark, rows, tdir)
    r = extensions_r20.x215_mad_outliers(spark, tdir).collect()[0]
    assert (
        r["n"],
        r["med_q"],
        r["mad_q"],
        r["n_outliers"],
        r["outlier_ppm"],
    ) == (7, 5, 4, 0, 0)


def test_mad_outliers_degenerate_mad_zero(spark, tdir):
    """≥ half the mass on one value → MAD = 0 → the 3·MAD fence
    degenerates and every off-median value is an outlier (the
    documented standard behavior)."""
    vals = [0.007] * 4 + [0.1]
    rows = [
        (i, T0_DAY * NS_PER_DAY + i, 1, "view", v)
        for i, v in enumerate(vals)
    ]
    _write_events(spark, rows, tdir)
    r = extensions_r20.x215_mad_outliers(spark, tdir).collect()[0]
    assert (r["med_q"], r["mad_q"], r["n_outliers"]) == (7, 0, 1)
    assert r["outlier_ppm"] == 200000


# ------------------------------------------------------------- x216


def test_benford_digit_extraction_and_grid(spark, tdir):
    """Digit = first char of the integer CENTS string: 0.01→1,
    12.34→1, 0.95→9, 327.53→3; the 9-digit spine zero-fills the
    gaps and tvd_ppm matches the Python recomputation."""
    vals = [0.01, 12.34, 0.95, 327.53]
    rows = [
        (i, T0_DAY * NS_PER_DAY + i, 1, "view", v)
        for i, v in enumerate(vals)
    ]
    _write_events(spark, rows, tdir)
    out = extensions_r19.x216_benford_digits(spark, tdir).collect()
    assert len(out) == 9
    by_digit = {r["digit"]: r for r in out}
    assert by_digit[1]["n_d"] == 2
    assert by_digit[3]["n_d"] == 1
    assert by_digit[9]["n_d"] == 1
    assert by_digit[2]["n_d"] == 0
    shares = {
        d: (1_000_000 * by_digit[d]["n_d"]) // 4 for d in range(1, 10)
    }
    tvd = (
        sum(
            abs(shares[d] - extensions_r19._BENFORD_PPM[d - 1])
            for d in range(1, 10)
        )
        // 2
    )
    assert all(r["tvd_ppm"] == tvd for r in out)


def test_benford_loguniform_reads_close_uniform_far(spark, tdir):
    """A log-uniform corpus (the Benford-generating distribution)
    reads CLOSE to the expected shares while a uniform corpus reads
    FAR — the instrument discriminates, which is its job."""
    lognif = [
        (i, T0_DAY * NS_PER_DAY + i, 1, "lg", 10 ** (i / 400.0))
        for i in range(1600)  # 4 decades, 0.01×10⁰ .. 10⁴ cents
    ]
    unif = [
        (10000 + i, T0_DAY * NS_PER_DAY + i, 1, "un", 1.0 + i / 10.0)
        for i in range(1600)
    ]
    _write_events(spark, lognif + unif, tdir)
    out = extensions_r19.x216_benford_digits(spark, tdir).collect()
    tvd = {r["event_type"]: r["tvd_ppm"] for r in out}
    assert tvd["lg"] < 30000
    assert tvd["un"] > 200000


def test_benford_all_subcent_empty(spark, tdir):
    """Values rounding to 0 cents are excluded; an all-subcent corpus
    yields a well-formed empty grid."""
    rows = [(0, T0_DAY * NS_PER_DAY, 1, "view", 0.004)]
    _write_events(spark, rows, tdir)
    assert extensions_r19.x216_benford_digits(spark, tdir).count() == 0


# ------------------------------------------------------------- s31


def test_s31_stream_equals_batch(spark, tdir):
    """The streaming entropy trajectory over a real two-file stream
    must equal the batch twin row-for-row — the s27 identity applied
    to the fourth readout on the shared distribution-monitor cells."""
    from m5_competition_kaggle_spark.queries.extensions_r19 import (
        s31_stream_entropy,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table
    from m5_competition_kaggle_spark.streaming.entropy_monitor import (
        streaming_entropy_trajectory,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    expected = sorted(
        tuple((str(v) if hasattr(v, "year") else v) for v in r)
        for r in s31_stream_entropy(spark, sf).collect()
    )
    assert expected, "batch twin produced no rows"

    d = tempfile.mkdtemp(prefix="events_entropy_stream_")
    ckpt = tempfile.mkdtemp(prefix="entropy_ckpt_")
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
        q = streaming_entropy_trajectory(
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


def test_entropy_sees_what_gini_misses(spark):
    """Planted day cells separating the two reference-free readouts:
    a day with all mass on ONE value has Gini 0 AND entropy 0; a day
    spread evenly over three ADJACENT values still has near-zero
    Gini (mass stays balanced) but entropy ≈ ln 3 — the diversity
    alarm concentration metrics can't raise. Exact micro-nat pins
    against the Python recomputation."""
    import datetime as dt

    from m5_competition_kaggle_spark.streaming.entropy_monitor import (
        entropy_day_table,
    )
    from m5_competition_kaggle_spark.streaming.gini_monitor import (
        gini_day_table,
    )

    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    cells = spark.createDataFrame(
        [
            (d1, 10, 99),
            (d2, 9, 33),
            (d2, 10, 33),
            (d2, 11, 33),
        ],
        "day date, q long, c_cmp long",
    )
    ent = {r["day"]: r for r in entropy_day_table(cells).collect()}
    gin = {r["day"]: r for r in gini_day_table(cells).collect()}

    def L(x: float) -> int:
        return round(math.log(x) * 1_000_000)

    assert ent[d1]["h_num"] == 0 and ent[d1]["h_unat"] == 0
    expect_h2 = 3 * 33 * (L(99.0) - L(33.0))
    assert ent[d2]["h_num"] == expect_h2
    assert ent[d2]["h_unat"] == expect_h2 // 99
    # ln 3 in micro-nats, exactly (99 divides the term sum)
    assert ent[d2]["h_unat"] == L(99.0) - L(33.0)
    # Gini barely moves: day 2 stays under 7% concentration
    assert gin[d1]["gini_ppm"] == 0
    assert gin[d2]["gini_ppm"] < 70000


# ------------------------------------------------------------- x217


def test_changepoint_perfect_step_r2_exact(spark, tdir):
    """A clean two-level step (10 days at 10, then 10 days at 50)
    pins the exact R² arithmetic: the best split explains ALL the
    variance — r2_ppm = 10⁶ exactly, split after position 10."""
    rows = []
    for k in range(20):
        v = 10.0 if k < 10 else 50.0
        rows.append((k, (T0_DAY + k) * NS_PER_DAY, 1, "view", v))
    _write_events(spark, rows, tdir)
    r = extensions_r20.x217_changepoint_split(
        spark, tdir
    ).collect()[0]
    assert (
        r["n_days"],
        r["split_day"],
        r["split_k"],
        r["r2_ppm"],
    ) == (20, T0_DAY + 9, 10, 1_000_000)


def test_changepoint_constant_series_null_score(spark, tdir):
    """Zero total variance → every candidate's R² is NULL; the
    NULLS LAST argmax deterministically picks the earliest candidate
    day with a NULL score (both engines order identically)."""
    rows = [
        (k, (T0_DAY + k) * NS_PER_DAY, 1, "view", 7.0)
        for k in range(5)
    ]
    _write_events(spark, rows, tdir)
    r = extensions_r20.x217_changepoint_split(
        spark, tdir
    ).collect()[0]
    assert (r["split_day"], r["split_k"], r["r2_ppm"]) == (
        T0_DAY,
        1,
        None,
    )


def test_changepoint_single_day_type_absent(spark, tdir):
    """A type observed on one day has no candidate split (k < m is
    empty) — it is absent from the output, not an error row."""
    rows = [
        (0, T0_DAY * NS_PER_DAY, 1, "solo", 5.0),
        (1, T0_DAY * NS_PER_DAY, 1, "pair", 5.0),
        (2, (T0_DAY + 1) * NS_PER_DAY, 1, "pair", 9.0),
    ]
    _write_events(spark, rows, tdir)
    out = extensions_r20.x217_changepoint_split(
        spark, tdir
    ).collect()
    assert [r["event_type"] for r in out] == ["pair"]


# ------------------------------------------------------------- x218


def test_fk_integrity_planted_orphans(spark, tdir):
    """Copy the sf0.001 catalog, then replace nation with a version
    holding one orphan n_regionkey (99) carrying two nations and one
    NULL key — the nation->region edge must read exactly that, and
    a clean edge (customer->nation via surviving keys) must stay
    zero-orphan."""
    import duckdb

    from m5_competition_kaggle_spark.queries.extensions_r15 import (
        _FK_EDGES,
        _x218_oracle,
        x218_fk_integrity,
    )
    from m5_competition_kaggle_spark.sources.catalog import TABLES

    sf = "/root/testdata/sf0.001"
    tables = {c for c, _, _, _ in _FK_EDGES} | {
        p for _, _, p, _ in _FK_EDGES
    }
    for t in tables:
        shutil.copytree(
            os.path.join(sf, f"{t}.parquet"),
            os.path.join(tdir, f"{t}.parquet"),
        ) if os.path.isdir(
            os.path.join(sf, f"{t}.parquet")
        ) else shutil.copy(
            os.path.join(sf, f"{t}.parquet"),
            os.path.join(tdir, f"{t}.parquet"),
        )
    os.remove(os.path.join(tdir, "nation.parquet")) if os.path.isfile(
        os.path.join(tdir, "nation.parquet")
    ) else shutil.rmtree(os.path.join(tdir, "nation.parquet"))
    spark.createDataFrame(
        [
            (0, "ALPHA", 0),
            (1, "BETA", 99),
            (2, "GAMMA", 99),
            (3, "DELTA", None),
        ],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.parquet(os.path.join(tdir, "nation.parquet"))

    out = {
        r["edge"]: r
        for r in x218_fk_integrity(spark, tdir).collect()
    }
    nr = out["nation.n_regionkey->region.r_regionkey"]
    assert (
        nr["n_child_rows"],
        nr["n_orphan_rows"],
        nr["n_orphan_keys"],
        nr["n_null_rows"],
    ) == (4, 2, 1, 1)
    # the fixture's own edges are referentially clean
    li = out["lineitem.l_orderkey->orders.o_orderkey"]
    assert li["n_orphan_rows"] == 0 and li["n_null_rows"] == 0

    # differential on the PLANTED corpus too — the oracle must agree
    # on the orphan readings, not just on clean data
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(tdir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{path}/*.parquet')"
                if os.path.isdir(path)
                else f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{path}')"
            )
    oracle = {r[0]: r for r in con.execute(_x218_oracle()).fetchall()}
    gr = oracle["nation.n_regionkey->region.r_regionkey"]
    assert (gr[1], gr[3], gr[4], gr[5]) == (4, 2, 1, 1)


# ------------------------------------------------------------- x219


def test_ewma_forecast_brute_force_twin(spark, tdir):
    """A seeded 45-day series replayed through the same integer
    arithmetic in pure Python bigints — every output column must
    match the brute-force twin exactly."""
    import random

    from m5_competition_kaggle_spark.queries.extensions_r16 import (
        EWMA_LAGS,
        _EWMA_DEN,
    )

    rng = random.Random(1414)
    ys = [rng.randrange(0, 500) for _ in range(45)]
    rows = [
        (i, (T0_DAY + i) * NS_PER_DAY, 1, "view", float(y))
        for i, y in enumerate(ys)
    ]
    _write_events(spark, rows, tdir)
    r = extensions_r16.x219_ewma_forecast(spark, tdir).collect()[0]

    n_eval = win = se = sn = 0
    for t in range(EWMA_LAGS, len(ys)):
        fc_num = sum(
            (1 << (EWMA_LAGS - i)) * ys[t - i]
            for i in range(1, EWMA_LAGS + 1)
        )
        r_e = _EWMA_DEN * ys[t] - fc_num
        r_n = _EWMA_DEN * (ys[t] - ys[t - 1])
        n_eval += 1
        win += 1 if abs(r_e) < abs(r_n) else 0
        se += r_e * r_e
        sn += r_n * r_n
    assert (
        r["n_eval_days"],
        r["win_days"],
        r["win_ppm"],
        r["err_share_ppm"],
    ) == (
        n_eval,
        win,
        1_000_000 * win // n_eval,
        1_000_000 * se // (se + sn),
    )


def test_ewma_constant_series_null_share(spark, tdir):
    """A constant series makes BOTH forecasters exact (r_e = r_n = 0
    every day) — err_share_ppm is NULL (guarded 0/0), win_days 0."""
    rows = [
        (i, (T0_DAY + i) * NS_PER_DAY, 1, "view", 50.0)
        for i in range(30)
    ]
    _write_events(spark, rows, tdir)
    r = extensions_r16.x219_ewma_forecast(spark, tdir).collect()[0]
    assert (r["win_days"], r["err_share_ppm"]) == (0, None)


def test_ewma_short_span_type_absent(spark, tdir):
    """A type whose calendar span is within the warm-up window has
    no eval days — absent from the output, not an error."""
    rows = [
        (i, (T0_DAY + i) * NS_PER_DAY, 1, "short", 5.0)
        for i in range(10)
    ] + [
        (100 + i, (T0_DAY + i) * NS_PER_DAY, 1, "long", 5.0)
        for i in range(30)
    ]
    _write_events(spark, rows, tdir)
    out = extensions_r16.x219_ewma_forecast(spark, tdir).collect()
    assert [r["event_type"] for r in out] == ["long"]


# ------------------------------------------------------------- x220


def test_emd_two_level_shift_closed_form(spark, tdir):
    """Two days, each a point mass, 4 units apart: the corpus is the
    50/50 mix, so each day's EMD to it is exactly 2 units →
    emd_milli = 2000 on both days (and the KS gap would read the
    SAME 0.5 for any shift size — the property EMD adds)."""
    rows = [
        (i, T0_DAY * NS_PER_DAY + i, 1, "view", 10.0)
        for i in range(50)
    ] + [
        (100 + i, (T0_DAY + 1) * NS_PER_DAY + i, 1, "view", 14.0)
        for i in range(50)
    ]
    _write_events(spark, rows, tdir)
    out = extensions_r18.x220_emd_drift(spark, tdir).collect()
    assert [(r["n_day"], r["emd_milli"]) for r in out] == [
        (50, 2000),
        (50, 2000),
    ]


def test_emd_identical_day_zero(spark, tdir):
    """A single-day corpus is its own reference — EMD exactly 0."""
    rows = [
        (i, T0_DAY * NS_PER_DAY + i, 1, "view", float(v))
        for i, v in enumerate((1, 5, 5, 9, 20))
    ]
    _write_events(spark, rows, tdir)
    out = extensions_r18.x220_emd_drift(spark, tdir).collect()
    assert [(r["n_day"], r["emd_milli"]) for r in out] == [(5, 0)]


# ------------------------------------------------------------- x221


def test_transition_lift_alternating_closed_form(spark, tdir):
    """An A,B,A,B,A timeline has only cross transitions: every cell
    reads lift = L(T·c) − L(r·s) = L(8) − L(4) ≈ +ln 2 micro-nats,
    pinned against the Python recomputation."""
    seq = ["A", "B", "A", "B", "A"]
    rows = [
        (i, T0_DAY * NS_PER_DAY + i * 1000, 1, s, 1.0)
        for i, s in enumerate(seq)
    ]
    _write_events(spark, rows, tdir)
    out = extensions_r17.x221_transition_lift(spark, tdir).collect()

    def L(x: float) -> int:
        return round(math.log(x) * 1_000_000)

    assert [
        (r["a"], r["b"], r["c_ab"], r["lift_unat"]) for r in out
    ] == [
        ("A", "B", 2, L(4.0 * 2) - L(2.0 * 2)),
        ("B", "A", 2, L(4.0 * 2) - L(2.0 * 2)),
    ]


def test_transition_lift_product_form_zero(spark, tdir):
    """A timeline whose pair counts sit in exact product form
    (A,A,B,B,A → each of the four cells once; T = 4, every marginal
    2) pins lift ≡ 0 in every cell — independence certifies with no
    tolerance, the x213 property at transition granularity."""
    seq = ["A", "A", "B", "B", "A"]
    rows = [
        (i, T0_DAY * NS_PER_DAY + i * 1000, 1, s, 1.0)
        for i, s in enumerate(seq)
    ]
    _write_events(spark, rows, tdir)
    out = extensions_r17.x221_transition_lift(spark, tdir).collect()
    assert len(out) == 4
    assert all(r["lift_unat"] == 0 for r in out)


# ---------------------------------------------- empty-corpus guards


@pytest.mark.parametrize(
    "fn",
    [
        lambda s, d: extensions_r16.x211_weekly_spectrum(s, d),
        lambda s, d: extensions_r17.x213_mutual_information(s, d),
        lambda s, d: extensions_r17.x221_transition_lift(s, d),
        lambda s, d: extensions_r18.x214_km_hazard(s, d),
        lambda s, d: extensions_r18.x220_emd_drift(s, d),
        lambda s, d: extensions_r19.x216_benford_digits(s, d),
        lambda s, d: extensions_r19.s31_stream_entropy(s, d),
        lambda s, d: extensions_r20.x215_mad_outliers(s, d),
        lambda s, d: extensions_r20.x217_changepoint_split(s, d),
        lambda s, d: extensions_r16.x219_ewma_forecast(s, d),
    ],
    ids=[
        "x211", "x213", "x221", "x214", "x220", "x216", "s31",
        "x215", "x217", "x219",
    ],
)
def test_new_queries_empty_events(spark, tdir, fn):
    """Every r14-session events query yields a well-formed EMPTY
    result on an empty events table — no throw, no fabricated row
    (the x208 empty-corpus ADVICE class, guarded up front)."""
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tdir, "events.parquet")
    )
    assert fn(spark, tdir).count() == 0
