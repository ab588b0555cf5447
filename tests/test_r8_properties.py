"""Pure-arithmetic properties behind the r8-queue operators —
hypothesis over Python references (no Spark per example, same pattern
as test_r5/r6_properties). The r6 lesson: a brute-force property test
caught a real kernel bug BEFORE certification, so every new
exact-arithmetic operator gets one.

1. Modularity identity: summed over parts, the 4m²-scaled terms equal
   Newman's Q exactly, Q of the all-in-one partition is 0, and every
   q_term matches the definition against a brute-force edge scan.
2. Zone-map pruning is SOUND: a pruned block can contain no row
   matching the predicate (no false pruning, ever) — and on a
   dimension-sorted layout it is also tight up to block granularity.
3. MI cell identity: sum of weighted PMI terms is symmetric in the
   arguments and zero for product distributions.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------- modularity

edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] < e[1]
    ),
    min_size=1, max_size=20, unique=True,
)
assignments = st.lists(st.integers(0, 2), min_size=10, max_size=10)


def _modularity_terms(edges, part_of):
    """Python reference mirroring operators/modularity.py."""
    m = len(edges)
    intra = Counter()
    deg = Counter()
    for a, b in edges:
        deg[part_of[a]] += 1
        deg[part_of[b]] += 1
        if part_of[a] == part_of[b]:
            intra[part_of[a]] += 1
    return {
        p: 4 * m * intra.get(p, 0) - deg[p] * deg[p] for p in deg
    }, m


@settings(max_examples=500, deadline=None)
@given(edge_lists, assignments)
def test_modularity_scaled_terms_equal_newman_q(edges, parts):
    terms, m = _modularity_terms(edges, parts)
    q_scaled = sum(terms.values()) / (4 * m * m)
    q_newman = 0.0
    for p in set(terms):
        l_c = sum(
            1 for a, b in edges if parts[a] == p and parts[b] == p
        )
        d_c = sum((parts[a] == p) + (parts[b] == p) for a, b in edges)
        q_newman += l_c / m - (d_c / (2 * m)) ** 2
    assert abs(q_scaled - q_newman) <= 1e-12


@settings(max_examples=200, deadline=None)
@given(edge_lists)
def test_modularity_single_part_is_exactly_zero(edges):
    terms, _ = _modularity_terms(edges, [0] * 10)
    assert sum(terms.values()) == 0


# ------------------------------------------------------------- zone maps

layouts = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 50)),
    min_size=1, max_size=60,
)


@settings(max_examples=500, deadline=None)
@given(layouts, st.integers(1, 7), st.integers(0, 50), st.integers(0, 50))
def test_zone_map_pruning_never_false_prunes(rows, block_size, lo, span):
    """Soundness: the envelope test can never prune a block holding a
    matching row, under ANY layout order."""
    hi = min(50, lo + span)
    blocks: dict[int, list[tuple[int, int]]] = {}
    for i, r in enumerate(rows):
        blocks.setdefault(i // block_size, []).append(r)
    for rs in blocks.values():
        mn = min(v for v, _ in rs)
        mx = max(v for v, _ in rs)
        pruned = mx < lo or mn > hi
        if pruned:
            assert not any(lo <= v <= hi for v, _ in rs)


@settings(max_examples=300, deadline=None)
@given(layouts, st.integers(1, 7))
def test_zone_map_sorted_layout_tight_to_one_gap_block(rows, bs):
    """On a dimension-sorted layout the envelope test is tight up to
    ONE block: the only unpruned block allowed to contain no match is
    the single block whose values jump across the whole range (its
    envelope straddles [lo, hi] while every value lands outside). Two
    such blocks cannot exist — the jump is between two CONSECUTIVE
    sorted values, which share at most one block."""
    rows = sorted(rows)
    lo, hi = 10, 20
    unpruned_without_match = 0
    for i in range(0, len(rows), bs):
        rs = rows[i:i + bs]
        mn, mx = rs[0][0], rs[-1][0]
        has_match = any(lo <= v <= hi for v, _ in rs)
        pruned = mx < lo or mn > hi
        if pruned:
            assert not has_match  # soundness again, via the sort
        elif not has_match:
            unpruned_without_match += 1
    assert unpruned_without_match <= 1


# ------------------------------------------------------------------- MI

joint_tables = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2)),
    min_size=2, max_size=40,
)


def _mi(pairs):
    n = len(pairs)
    cxy = Counter(pairs)
    cx = Counter(x for x, _ in pairs)
    cy = Counter(y for _, y in pairs)
    return sum(
        (c / n) * math.log(n * c / (cx[x] * cy[y]))
        for (x, y), c in cxy.items()
    )


@settings(max_examples=500, deadline=None)
@given(joint_tables)
def test_mi_symmetric_and_nonnegative(pairs):
    mi_xy = _mi(pairs)
    mi_yx = _mi([(y, x) for x, y in pairs])
    assert abs(mi_xy - mi_yx) < 1e-9
    assert mi_xy > -1e-9  # MI >= 0 (floating slack)


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 4), st.integers(1, 4), st.integers(1, 3))
def test_mi_product_distribution_is_zero(nx, ny, reps):
    pairs = [(x, y) for x in range(nx) for y in range(ny)
             for _ in range(reps)]
    assert abs(_mi(pairs)) < 1e-9
