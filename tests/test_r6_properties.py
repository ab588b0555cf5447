"""Pure-arithmetic properties behind the r6 operators — hypothesis
over the integer rules themselves (no Spark per example, same pattern
as test_r5_properties).

1. The prefix-filter lemma jaccard_prefix_join relies on: for ANY two
   sets with q*|inter| >= p*|union| and ANY shared total token order,
   the per-set prefixes of length n - ceil(p*n/q) + 1 intersect.
2. The bucket-expansion rule interval_join relies on: s <= t < e
   implies floor(t/g) lies in [floor(s/g), floor((e-1)/g)] — so every
   true match survives the equi-join, and exactly once (the point owns
   ONE bucket).
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _ceil_mul(n, p, q):
    return (p * n + q - 1) // q


set_pairs = st.tuples(
    st.sets(st.integers(0, 60), min_size=1, max_size=25),
    st.sets(st.integers(0, 60), min_size=1, max_size=25),
    st.permutations(list(range(61))),
    st.sampled_from([(1, 2), (3, 5), (2, 3), (9, 10), (1, 1)]),
)


@settings(max_examples=2000, deadline=None)
@given(set_pairs)
def test_prefix_filter_lemma(case):
    sa, sb, order, (p, q) = case
    inter = len(sa & sb)
    union = len(sa | sb)
    if q * inter < p * union:
        return  # below threshold — lemma makes no claim
    rank = {tok: i for i, tok in enumerate(order)}
    pa = sorted(sa, key=rank.__getitem__)[
        : len(sa) - _ceil_mul(len(sa), p, q) + 1]
    pb = sorted(sb, key=rank.__getitem__)[
        : len(sb) - _ceil_mul(len(sb), p, q) + 1]
    assert set(pa) & set(pb), (sa, sb, p, q)


@settings(max_examples=2000, deadline=None)
@given(
    st.integers(-2 * 10**18, 2 * 10**18),
    st.integers(1, 10**12),
    st.integers(-10**15, 10**15),
    st.integers(1, 10**9),
)
def test_bucket_expansion_covers_every_match_once(s, length, t_off, g):
    """Epoch-nanos exceed double's 2^52 integer precision, so the
    engines' float-division floor can shift bucket ids near boundaries
    — but float division is MONOTONE, so containment (and with it join
    losslessness) survives the rounding; the exact post-filter keeps
    results exact. This property exercises the full nanos range with
    the same float arithmetic Spark uses."""
    e = s + length
    t = s + (t_off % length)  # guaranteed s <= t < e
    lo, hi = math.floor(s / g), math.floor((e - 1) / g)
    tb = math.floor(t / g)
    assert lo <= tb <= hi  # the point's single bucket is in the span


@settings(max_examples=500, deadline=None)
@given(
    st.integers(0, 10**6), st.integers(1, 10**6), st.integers(1, 10**4)
)
def test_bucket_expansion_fanout_bound(s, length, g):
    """Interval fan-out is at most ceil(length/g) + 1 (one extra for
    straddling a boundary) — the cost model the operator docstring
    promises."""
    e = s + length
    n_buckets = math.floor((e - 1) / g) - math.floor(s / g) + 1
    assert n_buckets <= (length + g - 1) // g + 1
