"""Unit tests for the round-8-queue operators (infotheory, modularity,
layout) on tiny hand-checked inputs — the oracle harness certifies the
registered queries end-to-end; these pin operator semantics the
fixtures don't isolate."""

import math

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.infotheory import (
    mutual_information_cells,
)
from m5_competition_kaggle_spark.operators.layout import (
    pruning_stats,
    zone_map_blocks,
)
from m5_competition_kaggle_spark.operators.modularity import (
    partition_modularity,
)


# ------------------------------------------------------------ infotheory


def test_mi_independent_is_zero(spark):
    # perfectly independent 2x2: every cell c_xy = 2, marginals 4, n=8
    rows = [(x, y) for x in "ab" for y in (0, 1) for _ in range(2)]
    df = spark.createDataFrame(rows, "x string, y int")
    out = mutual_information_cells(df, "x", "y").collect()
    assert len(out) == 4
    assert all(abs(r.mi_term) < 1e-12 for r in out)


def test_mi_deterministic_dependence_is_entropy(spark):
    # y == f(x), uniform over 2 symbols -> MI = H(Y) = ln 2
    df = spark.createDataFrame(
        [("a", 0)] * 3 + [("b", 1)] * 3, "x string, y int"
    )
    out = mutual_information_cells(df, "x", "y").collect()
    mi = sum(r.mi_term for r in out)
    assert mi == pytest.approx(math.log(2), abs=1e-12)
    # NULLs in either column are excluded, not a category
    df2 = spark.createDataFrame(
        [("a", 0), ("a", None), (None, 1)], "x string, y int"
    )
    cells = mutual_information_cells(df2, "x", "y").collect()
    assert len(cells) == 1 and cells[0].n == 1


# ------------------------------------------------------------ modularity


def test_modularity_two_clean_communities(spark):
    # two triangles, no cross edges: Q = 2*(3/6 - (6/12)^2) = 1/2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)],
        "id_a long, id_b long",
    )
    assign = spark.createDataFrame(
        [(i, "L" if i <= 3 else "R") for i in range(1, 7)],
        "node long, part string",
    )
    out = {r.part: r for r in partition_modularity(edges, assign).collect()}
    m = 6
    for p in ("L", "R"):
        assert out[p].n_intra == 3 and out[p].d_sum == 6
        assert out[p].q_term_4m2 == 4 * m * 3 - 36
    q = sum(r.q_term_4m2 for r in out.values()) / (4 * m * m)
    assert q == pytest.approx(2 * (3 / 6 - (6 / (2 * m)) ** 2))


def test_modularity_single_part_is_zero(spark):
    # everything in one part: L_c = m, d_c = 2m -> 4m*m - 4m^2 = 0
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    assign = spark.createDataFrame(
        [(i, "all") for i in (1, 2, 3)], "node long, part string"
    )
    out = partition_modularity(edges, assign).collect()
    assert len(out) == 1 and out[0].q_term_4m2 == 0


# ---------------------------------------------------------------- layout


def test_zone_maps_sorted_layout_prunes_everything_outside(spark):
    df = spark.createDataFrame(
        [(i, i % 10) for i in range(40)], "k long, v long"
    )
    blocks = zone_map_blocks(df, ["v", "k"], ["v"], block_size=10)
    got = {r.block: (r.min_v, r.max_v, r.n_rows) for r in blocks.collect()}
    # sorted by v: each block of 10 rows covers at most 3 v values
    assert len(got) == 4 and all(n == 10 for _, _, n in got.values())
    stats = pruning_stats(blocks, {"v": (0, 1)}).collect()[0]
    # only the first block(s) can contain v in [0,1]
    assert stats.n_blocks == 4
    assert stats.n_pruned == 3
    assert stats.pruned_permille == 750
    assert stats.rows_skipped == 30
    # the same rows laid out by k (v scattered) prune nothing
    scattered = zone_map_blocks(df, ["k"], ["v"], block_size=10)
    s2 = pruning_stats(scattered, {"v": (0, 1)}).collect()[0]
    assert s2.n_pruned == 0


def test_zone_maps_reject_bad_block_size(spark):
    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError, match="block_size"):
        zone_map_blocks(df, ["k"], ["v"], block_size=0)


def test_zone_map_rank_is_global_not_single_partition(spark):
    """The block ids must come from the distributed prefix scan — no
    single-partition window over the whole table. Since the r11
    persist-leak fix, global_running_sum materializes its ranged
    intermediate via localCheckpoint (truncating the visible lineage),
    so the range exchange is asserted on the scan's exposed lazy
    phase-1 frame instead of the downstream plan."""
    from m5_competition_kaggle_spark.operators.prefix import (
        _ranged_local_sums,
    )

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    plan = zone_map_blocks(
        df, ["k"], ["v"], block_size=50
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    phase1 = _ranged_local_sums(
        df.withColumn("__one", F.lit(1).cast("long")), "__one", ("k",)
    )._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in phase1.lower()
