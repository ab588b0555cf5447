"""Pure-arithmetic properties behind the r8-queue second batch —
hypothesis over Python references (no Spark per example, same pattern
as test_r8_properties).

1. Kappa: bounded by ±1, exactly 1 on identical raters, invariant
   under a shared relabeling of categories, and the exact rational
   matches the float definition.
2. k-anonymity profile: the histogram partitions the input exactly
   (row and class counts reconcile), min_ldiv respects 1 <= l <=
   class_size, and the violating rows are exactly those in sub-k
   classes.
3. PSI terms are individually non-negative ((p-q) and ln(p/q) share
   their sign) and symmetric under swapping the two windows.
4. Local clustering coefficient: permille in [0, 1000]; 1000 exactly
   on complete graphs; 0 on triangle-free graphs.
"""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

# --------------------------------------------------------------- kappa

pairs = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 3)),
    min_size=1, max_size=60,
)


def _kappa_rational(rows):
    """Python reference mirroring operators/agreement.py."""
    n = len(rows)
    diag = sum(1 for a, b in rows if a == b)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    e = sum(ra[k] * cb[k] for k in ra if k in cb)
    return n * diag - e, n * n - e


@settings(max_examples=500, deadline=None)
@given(pairs)
def test_kappa_bounded_and_matches_float_definition(rows):
    num, den = _kappa_rational(rows)
    if den == 0:
        # every item in one (a,b) cell with a==b: chance == observed
        n = len(rows)
        assert all(a == b for a, b in rows) or n == 0
        return
    assert -den <= num <= den  # kappa in [-1, 1]
    n = len(rows)
    po = sum(1 for a, b in rows if a == b) / n
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    pe = sum(ra[k] * cb[k] for k in ra if k in cb) / (n * n)
    assert abs(num / den - (po - pe) / (1 - pe)) <= 1e-12


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 3), min_size=1, max_size=40))
def test_kappa_identical_raters_is_one(labels):
    num, den = _kappa_rational([(v, v) for v in labels])
    assert num == den  # kappa == 1 even when den == 0 edge collapses


@settings(max_examples=300, deadline=None)
@given(pairs, st.permutations([0, 1, 2, 3]))
def test_kappa_invariant_under_shared_relabeling(rows, perm):
    base = _kappa_rational(rows)
    relabeled = _kappa_rational([(perm[a], perm[b]) for a, b in rows])
    assert base == relabeled


# ---------------------------------------------------------- k-anonymity

qs_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 2)),
    min_size=1, max_size=60,
)


def _profile(rows, k):
    """Python reference mirroring operators/privacy.py."""
    classes = Counter(q for q, _ in rows)
    ldiv = {
        q: len({s for qq, s in rows if qq == q}) for q in classes
    }
    hist = {}
    for q, size in classes.items():
        h = hist.setdefault(
            size, {"n_classes": 0, "n_rows": 0, "min_ldiv": size}
        )
        h["n_classes"] += 1
        h["n_rows"] += size
        h["min_ldiv"] = min(h["min_ldiv"], ldiv[q])
    return {
        size: {**h, "violates_k": int(size < k)}
        for size, h in hist.items()
    }


@settings(max_examples=500, deadline=None)
@given(qs_rows, st.integers(1, 10))
def test_k_anonymity_histogram_partitions_input(rows, k):
    prof = _profile(rows, k)
    assert sum(h["n_rows"] for h in prof.values()) == len(rows)
    assert sum(h["n_classes"] for h in prof.values()) == len(
        {q for q, _ in rows}
    )
    for size, h in prof.items():
        assert h["n_rows"] == size * h["n_classes"]
        assert 1 <= h["min_ldiv"] <= size
        assert h["violates_k"] == int(size < k)
    violating_rows = sum(
        h["n_rows"] for s, h in prof.items() if s < k
    )
    brute = sum(
        1 for q, _ in rows
        if sum(1 for q2, _ in rows if q2 == q) < k
    )
    assert violating_rows == brute


# ------------------------------------------------------------------ psi


@settings(max_examples=500, deadline=None)
@given(
    st.lists(st.integers(0, 3), min_size=1, max_size=50),
    st.lists(st.integers(0, 3), min_size=1, max_size=50),
)
def test_psi_terms_nonnegative_and_symmetric(ref, cmp_w):
    cr, cc = Counter(ref), Counter(cmp_w)
    nr, nc = len(ref), len(cmp_w)
    for k in set(cr) | set(cc):
        if cr[k] == 0 or cc[k] == 0:
            continue  # NULL term by contract
        p, q = cr[k] / nr, cc[k] / nc
        term = (p - q) * math.log(p / q)
        term_swapped = (q - p) * math.log(q / p)
        assert term >= 0.0
        assert abs(term - term_swapped) <= 1e-15


# ----------------------------------------------------- clustering coeff

graphs = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
        lambda e: e[0] < e[1]
    ),
    min_size=1, max_size=20, unique=True,
)


def _coeff_permille(edges):
    """Python reference mirroring operators/graph_coeff.py."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        tri = sum(
            1 for x, y in combinations(sorted(nbrs), 2)
            if y in adj.get(x, ())
        )
        out[v] = (
            (1000 * 2 * tri) // (d * (d - 1)) if d >= 2 else 0
        )
    return out


@settings(max_examples=500, deadline=None)
@given(graphs)
def test_coeff_bounded(edges):
    for v in _coeff_permille(edges).values():
        assert 0 <= v <= 1000


@settings(max_examples=100, deadline=None)
@given(st.integers(3, 7))
def test_coeff_complete_graph_is_one(n):
    edges = list(combinations(range(n), 2))
    assert set(_coeff_permille(edges).values()) == {1000}


@settings(max_examples=100, deadline=None)
@given(st.integers(2, 7))
def test_coeff_star_is_zero(n):
    edges = [(0, i) for i in range(1, n + 1)]
    assert set(_coeff_permille(edges).values()) == {0}
