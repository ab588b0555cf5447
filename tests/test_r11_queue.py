"""Staged certification for the round-11 queue
(queries/extensions_r11.py — x156 trained-codebook recall, x157
Heaps vocabulary growth, x158 pair-distance histogram). Staged TWO
rounds ahead (the r10 window is fully planned); same local gate as
the r9b/r10 queues: the check_oracle differential at sf0.001 AND
sf0.01, hand pins, and sf0.01 vacuity audits."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.queries import extensions_r11
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


@pytest.mark.parametrize("name", sorted(extensions_r11.QUERIES))
def test_differential_vs_duckdb(spark, name):
    sdf = extensions_r11.QUERIES[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF)
    tbl = con.sql(extensions_r11.ORACLES[name]).arrow()
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


@pytest.mark.parametrize("name", sorted(extensions_r11.QUERIES))
def test_differential_vs_duckdb_sf001(spark, name):
    sdf = extensions_r11.QUERIES[name](spark, SF01)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(SF01)
    tbl = con.sql(extensions_r11.ORACLES[name]).arrow()
    d_cols = tbl.column_names
    d_rows = [tuple(row[c] for c in d_cols) for row in tbl.to_pylist()]
    assert len(s_rows) == len(d_rows) and len(s_rows) > 0
    assert check_oracle.value_hash(s_rows, sdf.columns) == \
        check_oracle.value_hash(d_rows, d_cols)


def test_vocab_growth_hand_example(spark):
    """Three docs sharing one trigram: types count first occurrences
    only; deciles collapse onto the 3 ranks; TTR is exact."""
    from m5_competition_kaggle_spark.operators.heaps import (
        vocab_growth_deciles,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # trigrams: 'a b c', 'b c d'
            (2, "a b c"),            # 'a b c' again — no new type
            (3, "x y z w"),          # 'x y z', 'y z w'
        ],
        "doc_id bigint, text string",
    )
    got = {r["decile"]: r for r in vocab_growth_deciles(
        docs).collect()}
    # N=3: rank 1 → decile ceil(10/3)=4, rank 2 → 7, rank 3 → 10
    assert sorted(got) == [4, 7, 10]
    assert (got[4]["tokens_cum"], got[4]["types_cum"]) == (4, 2)
    assert (got[7]["tokens_cum"], got[7]["types_cum"]) == (7, 2)
    assert (got[10]["tokens_cum"], got[10]["types_cum"]) == (11, 4)
    assert got[10]["ttr_ppm"] == 1_000_000 * 4 // 11


def test_pair_distance_hand_example(spark):
    """Three sample vectors in 1-D at 0, 1, 3 (quantized ×1000):
    pair d² = 10⁶, 9·10⁶, 4·10⁶ — exact bucket placement."""
    from m5_competition_kaggle_spark.operators.pairdist import (
        pair_distance_histogram,
    )

    df = spark.createDataFrame(
        [(0, [0.0]), (25, [1.0]), (50, [3.0]), (7, [99.0])],
        "vec_id bigint, embedding array<double>",
    )
    got = {r["bucket"]: r for r in pair_distance_histogram(
        df, modulus=25, bucket_width=1_000_000).collect()}
    # vec 7 is NOT in the sample (7 % 25 != 0)
    assert got[1]["n_pairs"] == 1 and got[1]["min_d2"] == 1_000_000
    assert got[4]["n_pairs"] == 1 and got[4]["min_d2"] == 4_000_000
    assert got[9]["n_pairs"] == 1 and got[9]["max_d2"] == 9_000_000
    assert len(got) == 3


def test_jaccard_sweep_hand_example(spark):
    """Two identical docs → 1000 permille; disjoint → 0; half-overlap
    arithmetic exact."""
    from m5_competition_kaggle_spark.queries.extensions_r11 import (
        x159_jaccard_sweep,
    )
    import tempfile

    docs = spark.createDataFrame(
        [
            (0, "a b c", "en", "s", 5),
            (5, "a b c", "en", "s", 5),
            (10, "x y z", "en", "s", 5),
            (15, "a b x y", "en", "s", 7),
            (3, "ignored not in sample", "en", "s", 21),
        ],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = {r["bucket"]: r for r in x159_jaccard_sweep(
            spark, tmp).collect()}
    # pairs among {0,5,10,15}: (0,5) jac 1000; (0,10)/(5,10) jac 0;
    # (0,15)/(5,15) inter 2 of 5 → 400; (10,15) inter 2 of 5 → 400
    assert got[10]["n_pairs"] == 1 and got[10]["min_jac"] == 1000
    assert got[0]["n_pairs"] == 2
    assert got[4]["n_pairs"] == 3 and got[4]["max_jac"] == 400


def test_vacuity_sf001_audits(spark):
    """The r7 lesson applied to the r11 queue at sf0.01."""
    vg = extensions_r11.x157_vocab_growth(spark, SF01).collect()
    assert len(vg) == 10
    ttrs = [r["ttr_ppm"] for r in sorted(vg, key=lambda r: r["decile"])]
    # Heaps: the trigram TTR falls along the corpus and types GROW
    assert ttrs[0] > ttrs[-1]
    types = [r["types_cum"] for r in sorted(vg, key=lambda r: r["decile"])]
    assert types == sorted(types) and types[-1] > 2 * types[0]

    pd_ = extensions_r11.x158_pair_distances(spark, SF01).collect()
    assert len(pd_) >= 10  # real spread, not one lump
    assert sum(r["n_pairs"] for r in pd_) >= 190

    tr = extensions_r11.x156_trained_recall(spark, SF01).collect()
    assert len(tr) == 10
    mean_trained = sum(r["recall_permille"] for r in tr) // len(tr)
    # the trained codebook must IMPROVE on the certified seed rule
    # (x116's ivf method) — the whole point of training
    from m5_competition_kaggle_spark.queries.extensions_r8b import (
        x116_ann_recall,
    )

    seed = (
        x116_ann_recall(spark, SF01)
        .filter(F.col("method") == "ivf")
        .agg(F.avg("recall_permille"))
        .collect()[0][0]
    )
    assert mean_trained > seed

    js = extensions_r11.x159_jaccard_sweep(spark, SF01).collect()
    assert len(js) >= 5  # mass spreads across buckets
    assert sum(r["n_pairs"] for r in js) == 100 * 99 // 2

    cs = extensions_r11.x160_cross_source_dups(spark, SF01).collect()
    assert len(cs) > 5
    # cross-source duplication really exists (the matrix is the point)
    assert any(r["source_lo"] != r["source_hi"] for r in cs)
    assert any(r["source_lo"] == r["source_hi"] for r in cs)

    kr = extensions_r11.x161_knn_radius(spark, SF01).collect()
    assert len(kr) == 10
    assert all(r["dot_top1"] >= r["dot_top10"] for r in kr)
    assert len({r["contrast_permille"] for r in kr}) > 1
