"""Degenerate-input guards for the r14 staged operators (the
test_r12_r13_edge_guards pattern): empty or sub-minimal inputs must
yield well-formed empty/NULL results, never throw — these paths run in
production whenever a filter leaves nothing behind. Plus randomized
brute-force references pinning the CvM and surprisal kernels beyond
the fixed-fixture oracles."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.cvm import (
    cvm_from_cells,
    cvm_statistic,
)
from m5_competition_kaggle_spark.operators.gini import gini_by_group
from m5_competition_kaggle_spark.operators.markov import (
    transition_pairs,
    transition_surprisal,
)

GRP_Q = "grp string, q long"


def test_cvm_empty_sides_yield_no_rows(spark):
    empty = spark.createDataFrame([], GRP_Q)
    full = spark.createDataFrame([("g", 1)], GRP_Q)
    assert cvm_statistic(empty, empty, "grp", "q").count() == 0
    # one-sided groups are dropped, both directions
    assert cvm_statistic(full, empty, "grp", "q").count() == 0
    assert cvm_statistic(empty, full, "grp", "q").count() == 0


def test_cvm_null_q_cells_dropped(spark):
    """NULL quantized values have no place on the support axis (the
    ksdist convention) — they must not shift the running CDFs."""
    cells = spark.createDataFrame(
        [("g", None, 5, 5), ("g", 1, 3, 0), ("g", 2, 0, 3)],
        "grp string, q long, c_ref long, c_cmp long",
    )
    row = cvm_from_cells(cells, ["grp"]).collect()[0]
    assert row["n_ref"] == 3 and row["n_cmp"] == 3
    assert row["n_cells"] == 2


def test_cvm_brute_force_reference(spark):
    """Randomized pin: the distributed cell assembly equals the
    plain-Python permille-floored gap energy."""
    rng = random.Random(1414)
    ref = [rng.randrange(0, 12) for _ in range(80)]
    cmp_w = [rng.randrange(3, 15) for _ in range(60)]
    rdf = spark.createDataFrame([("g", v) for v in ref], GRP_Q)
    cdf = spark.createDataFrame([("g", v) for v in cmp_w], GRP_Q)
    row = cvm_statistic(rdf, cdf, "grp", "q").collect()[0]
    n, m = len(ref), len(cmp_w)
    support = sorted(set(ref) | set(cmp_w))
    energy = 0
    for q in support:
        a = sum(1 for v in ref if v <= q)
        b = sum(1 for v in cmp_w if v <= q)
        c = ref.count(q) + cmp_w.count(q)
        gap_pm = (1000 * abs(m * a - n * b)) // (n * m)
        energy += c * gap_pm * gap_pm
    assert row["gap_energy"] == energy
    assert row["omega2_micro"] == energy // (n + m)
    assert row["n_cells"] == len(support)


def test_gini_empty_and_single_member(spark):
    empty = spark.createDataFrame([], "grp string, v long")
    assert gini_by_group(empty, ["grp"], "v").count() == 0
    one = spark.createDataFrame([("g", 42)], "grp string, v long")
    row = gini_by_group(one, ["grp"], "v").collect()[0]
    # a single member holds everything: G = (n-1)/n = 0
    assert row["gini_ppm"] == 0
    assert row["top_share_ppm"] == 1_000_000


def test_surprisal_empty_and_brute_force(spark):
    empty = spark.createDataFrame([], "k string, t long, s string")
    assert transition_surprisal(empty, "k", "s", ("t",)).count() == 0

    rng = random.Random(99)
    rows = []
    for u in range(12):
        n = rng.randrange(1, 9)
        for t in range(n):
            rows.append((f"u{u}", t, rng.choice("ABC")))
    df = spark.createDataFrame(rows, "k string, t long, s string")
    got = {
        r["key"]: (r["n_trans"], r["sum_surprisal_unat"],
                   r["mean_surprisal_unat"])
        for r in transition_surprisal(df, "k", "s", ("t",)).collect()
    }
    # plain-Python reference
    timelines: dict = {}
    for k, t, s in rows:
        timelines.setdefault(k, []).append((t, s))
    pairs = []
    for k, tl in timelines.items():
        seq = [s for _, s in sorted(tl)]
        pairs += [(k, a, b) for a, b in zip(seq, seq[1:])]
    c_ab: dict = {}
    for _, a, b in pairs:
        c_ab[(a, b)] = c_ab.get((a, b), 0) + 1
    c_a: dict = {}
    for (a, _), c in c_ab.items():
        c_a[a] = c_a.get(a, 0) + c
    expected: dict = {}
    for k, a, b in pairs:
        s = round(math.log(c_a[a]) * 1e6) - round(
            math.log(c_ab[(a, b)]) * 1e6
        )
        n, tot = expected.get(k, (0, 0))
        expected[k] = (n + 1, tot + s)
    expected = {
        k: (n, tot, tot // n) for k, (n, tot) in expected.items()
    }
    assert got == expected


def test_transition_pairs_respects_order_cols(spark):
    """Out-of-order input rows must pair by the ORDER columns, not
    arrival order."""
    rows = [("u", 2, "C"), ("u", 0, "A"), ("u", 1, "B")]
    df = spark.createDataFrame(rows, "k string, t long, s string")
    got = sorted(
        (r["a"], r["b"])
        for r in transition_pairs(df, "k", "s", ("t",)).collect()
    )
    assert got == [("A", "B"), ("B", "C")]


def test_cvm_day_table_empty_stream_days(spark):
    """No post-split days at all: the grid is empty, the table is
    empty, nothing throws."""
    from m5_competition_kaggle_spark.streaming.cvm_monitor import (
        cvm_day_table,
    )

    days = spark.createDataFrame(
        [], "day date, q long, c_cmp long"
    )
    ref = spark.createDataFrame(
        [(1, 5)], "q long, c_ref long"
    )
    assert cvm_day_table(days, ref).count() == 0
