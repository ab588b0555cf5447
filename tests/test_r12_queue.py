"""Staged certification for the round-12 queue
(queries/extensions_r12.py — x162 LSH band power, x163 IVF re-cluster
decision, x164 PQ distortion, x165 shard-packing audit, x166 BM25 →
rerank → RBO+nDCG, s23/s24 streaming trend twins). Staged a round
ahead (the r11 window is fully booked); same local gate as the
r10/r11 queues: the check_oracle differential at sf0.001 AND sf0.01,
hand pins, vacuity audits, and the update-mode deployment of the
trend monitor."""

from __future__ import annotations

import importlib.util
import os
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r12
from m5_competition_kaggle_spark.sources.catalog import (
    TABLES,
    load_table,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
NS_PER_DAY = 86_400_000_000_000

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


@pytest.mark.parametrize("name", sorted(extensions_r12.QUERIES))
def test_differential_vs_duckdb(spark, name):
    sdf = extensions_r12.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r12.ORACLES[name]).arrow()
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


@pytest.mark.parametrize("name", sorted(extensions_r12.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    sdf = extensions_r12.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r12.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


# ------------------------------------------------------------ hand pins


def test_lsh_capture_recurrence_tracks_float_s_curve():
    """The truncating ppm recurrence must sit within a few ppm of the
    float S-curve 1−(1−j^r)^b for every permille j and every config —
    the truncation-error bound the module docstring claims (chain
    depth ≤ 4 per side, error amplified ≤ b·r·depth ppm ≪ 0.1%)."""
    from m5_competition_kaggle_spark.operators.lsh_power import (
        capture_ppm_sql,
    )

    con = duckdb.connect()
    for bands, rows in ((2, 8), (4, 4), (8, 2), (16, 1)):
        expr = capture_ppm_sql("jp", rows, bands, "//")
        got = dict(
            con.sql(
                f"SELECT jp, {expr} AS cap FROM "
                "(SELECT unnest(generate_series(0, 1000)) AS jp)"
            ).fetchall()
        )
        for j in range(0, 1001, 37):
            ref = (1 - (1 - (j / 1000.0) ** rows) ** bands) * 1e6
            assert abs(got[j] - ref) <= 1000, (bands, rows, j)
        # exact at the endpoints
        assert got[0] == 0 and got[1000] == 1_000_000


def test_lsh_capture_monotone_in_similarity(spark):
    """Capture probability is nondecreasing in the Jaccard bucket for
    every config — the property that makes the sweep a threshold
    chooser at all."""
    out = extensions_r12.x162_lsh_band_power(spark, SF01).collect()
    by_cfg: dict = {}
    for r in out:
        by_cfg.setdefault((r["bands"], r["rows_per_band"]), []).append(
            (r["bucket"], r["min_capture_ppm"], r["max_capture_ppm"])
        )
    assert len(by_cfg) == 4
    for cfg, cells in by_cfg.items():
        cells.sort()
        for (b1, _, hi1), (b2, lo2, _) in zip(cells, cells[1:]):
            assert lo2 >= hi1 - 1000, (cfg, b1, b2)


def test_pq_distortion_zero_for_codebook_corpus(spark):
    """A corpus consisting exactly of the codebook vectors encodes to
    itself — total distortion 0 in every subspace."""
    from m5_competition_kaggle_spark.operators.pq_eval import (
        pq_distortion,
    )

    emb = load_table(spark, SF, "embeddings").filter(
        F.col("vec_id") < 8
    )
    out = pq_distortion(emb, m=4, n_codes=8, dim=64).collect()
    assert len(out) == 4
    assert all(r["total_err"] == 0 and r["max_err"] == 0 for r in out)


def test_shard_packing_invariant_at_sf001(spark):
    """Every shard: overrun strictly below its largest chunk (an item
    packs where its START falls), and shards partition the chunk set
    contiguously."""
    out = extensions_r12.x165_shard_packing_audit(spark, SF01).collect()
    assert len(out) > 1
    assert all(r["ok"] == 1 for r in out)
    assert any(r["overrun"] > 0 for r in out)
    # all but the last shard are filled past budget-minus-max-chunk
    for r in out[:-1]:
        assert r["total_tokens"] > 4096 - r["max_chunk"]


def test_ivf_recluster_flags_fire_on_minority(spark):
    """Vacuity guard: the drift flag fires on SOME lists and not
    all — a flag that is constant certifies nothing."""
    for sf in (SF, SF01):
        flags = [
            r["recluster"]
            for r in extensions_r12.x163_ivf_recluster(
                spark, sf
            ).collect()
        ]
        assert 0 < sum(flags) < len(flags), (sf, flags)


def test_bm25_rerank_outputs_do_work(spark):
    """Vacuity guard: reranking by the semantic anchor must actually
    REORDER (rbo_ppm below the identical-ranking cap 651321 for at
    least one term) while keeping lexical relevance (every term
    retains hits; ndcg_ppm spread nondegenerate)."""
    out = extensions_r12.x166_bm25_rerank_eval(spark, SF01).collect()
    assert len(out) == 5
    assert all(r["n_hit"] > 0 for r in out)
    assert any(r["rbo_ppm"] < 651321 for r in out)
    vals = {r["ndcg_ppm"] for r in out}
    assert len(vals) > 1


# ------------------------------------------------- streaming deployment


def _stage(df, src, name):
    tmp = os.path.join(src, f"__{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(tmp, f),
                os.path.join(src, f"part-{name}.parquet"),
            )
    shutil.rmtree(tmp)


def test_trend_monitor_update_mode_matches_batch(spark):
    """The update-mode deployment (day-key cells merged into the
    ClosingDayStore across two file triggers) re-assembles, through
    BOTH kernels (changepoint and Theil–Sen), to exactly the batch
    twins' tables."""
    from m5_competition_kaggle_spark.streaming.trend_monitor import (
        changepoint_from_cells,
        day_key_cells,
        store_day_cells,
        streaming_day_cells_update_mode,
        theil_sen_from_cells,
    )
    from m5_competition_kaggle_spark.streaming.update_mode import (
        ClosingDayStore,
    )

    ev = load_table(spark, SF, "events")
    cells = day_key_cells(ev)
    exp_cp = sorted(
        tuple(r) for r in changepoint_from_cells(cells).collect()
    )
    exp_ts = sorted(
        tuple(r) for r in theil_sen_from_cells(cells).collect()
    )
    assert exp_cp and exp_ts

    src = tempfile.mkdtemp(prefix="trendmon_src_")
    ckpt = tempfile.mkdtemp(prefix="trendmon_ckpt_")
    lo = ev.agg(F.min("ts_nanos")).collect()[0][0]
    mid = lo + 15 * NS_PER_DAY + NS_PER_DAY // 2
    store = ClosingDayStore(allowed_lateness_days=2)
    try:
        _stage(ev.filter(F.col("ts_nanos") < mid), src, "a")
        _stage(ev.filter(F.col("ts_nanos") >= mid), src, "b")
        q = streaming_day_cells_update_mode(
            spark, src, store, ckpt, maxFilesPerTrigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        lifted = store_day_cells(spark, store)
        got_cp = sorted(
            tuple(r) for r in changepoint_from_cells(lifted).collect()
        )
        got_ts = sorted(
            tuple(r) for r in theil_sen_from_cells(lifted).collect()
        )
        assert got_cp == exp_cp
        assert got_ts == exp_ts
        assert store.rejected == 0
        # bounded state: |days| × |event types|
        days = {d for (d, _k) in store.data}
        keys = {k for (_d, k) in store.data}
        assert len(store.data) <= len(days) * len(keys)
        assert len(keys) == 5
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
