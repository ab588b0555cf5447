"""Pure-arithmetic properties behind the r8f batch — hypothesis over
Python references (no Spark per example).

1. Weighted quantiles: the picked value's cumulative mass reaches
   q·W, no smaller value's does, and quantiles are monotone in q.
2. Holt recurrence: exactly shift-equivariant (adding c to every
   observation adds c to the level and leaves the trend unchanged —
   true even under truncating integer division), and a constant
   series is a fixed point.
3. Funnel reach: step counts are non-increasing along the chain, and
   widening max_gap never loses a conversion (monotone in the gap).
4. Lift table: cumulative capture is non-decreasing, the full-corpus
   row sits exactly at the 1000-permille baseline, and lift is the
   capture/share ratio by construction.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# --------------------------------------------------- weighted quantile

wq_inputs = st.lists(
    st.tuples(st.integers(-1000, 1000), st.integers(1, 50)),
    min_size=1, max_size=80,
)


def _wq(cells, num, den):
    agg: dict[int, int] = {}
    for v, w in cells:
        agg[v] = agg.get(v, 0) + w
    total = sum(agg.values())
    cum = 0
    for v in sorted(agg):
        cum += agg[v]
        if cum * den >= total * num:
            return v, cum, total
    raise AssertionError("unreachable for 0 < num <= den")


@settings(max_examples=500, deadline=None)
@given(wq_inputs)
def test_weighted_quantile_mass_and_monotone(cells):
    picked = []
    for num, den in ((1, 4), (1, 2), (3, 4), (1, 1)):
        v, cum, total = _wq(cells, num, den)
        assert cum * den >= total * num  # mass reached
        # no strictly smaller value reaches the mass
        smaller = sum(w for x, w in cells if x < v)
        assert smaller * den < total * num
        picked.append(v)
    assert picked == sorted(picked)  # monotone in q


# ---------------------------------------------------------------- holt


def _tdiv(a, b):
    """Truncation-toward-zero division — both engines' integer DIV."""
    return -((-a) // b) if a < 0 else a // b


def _holt(ys, ad=4, bd=8):
    l, b = ys[0], 0
    for y in ys[1:]:
        e = y - l - b
        l = l + b + _tdiv(e, ad)
        b = b + _tdiv(e, bd)
    return l, b


series = st.lists(
    st.integers(-10**6, 10**6), min_size=1, max_size=60
)


@settings(max_examples=500, deadline=None)
@given(series, st.integers(-10**6, 10**6))
def test_holt_shift_equivariance(ys, c):
    l0, b0 = _holt(ys)
    l1, b1 = _holt([y + c for y in ys])
    # e is invariant under the shift, so level shifts by c exactly
    # and the trend is untouched — even with truncating division
    assert l1 == l0 + c
    assert b1 == b0


@settings(max_examples=200, deadline=None)
@given(st.integers(-10**6, 10**6), st.integers(1, 40))
def test_holt_constant_series_fixed_point(v, n):
    l, b = _holt([v] * n)
    assert (l, b) == (v, 0)


# -------------------------------------------------------------- funnel

funnel_events = st.lists(
    st.tuples(st.sampled_from("abc"), st.integers(0, 100)),
    min_size=1, max_size=40,
)


def _reach(events, gap=None):
    ts = {}
    prev = None
    for step in "abc":
        cand = [
            t for s, t in events
            if s == step
            and (prev is None or t > prev)
            and (prev is None or gap is None or t <= prev + gap)
        ]
        ts[step] = min(cand) if cand else None
        if ts[step] is None:
            # chain broken: all later steps unreachable
            for later in "abc"["abc".index(step) + 1:]:
                ts[later] = None
            break
        prev = ts[step]
    return ts


@settings(max_examples=500, deadline=None)
@given(funnel_events, st.integers(1, 120))
def test_funnel_monotonicity(events, gap):
    narrow = _reach(events, gap)
    wide = _reach(events, gap + 50)
    unbounded = _reach(events, None)
    # chain is non-increasing
    chain = [narrow.get(s) for s in "abc"]
    for a, b in zip(chain, chain[1:]):
        if a is None:
            assert b is None
    # widening the gap never loses a reached step — and because each
    # step's window is anchored at the previous pick and widening
    # only ADDS later candidates, the reached timestamps are
    # IDENTICAL wherever the narrow funnel reaches
    for s in "abc":
        if narrow.get(s) is not None:
            assert wide.get(s) == narrow[s]
            assert unbounded.get(s) == narrow[s]
    # soundness: every reached step is strictly after its
    # predecessor and inside the gap window
    prev = None
    for s in "abc":
        t = narrow.get(s)
        if t is not None and prev is not None:
            assert prev < t <= prev + gap
        prev = t if t is not None else prev


# ---------------------------------------------------------------- lift

lift_inputs = st.lists(
    st.tuples(st.integers(-1000, 1000), st.booleans()),
    min_size=1, max_size=100,
)


@settings(max_examples=500, deadline=None)
@given(lift_inputs)
def test_lift_identities(rows):
    ordered = sorted(
        enumerate(rows), key=lambda ir: (-ir[1][0], ir[0])
    )
    n = len(ordered)
    p = sum(1 for _, (_, pos) in ordered if pos)
    if p == 0:
        return
    cum_pos = 0
    prev_capture = 0
    for j, (_, (_, pos)) in enumerate(ordered, start=1):
        cum_pos += int(pos)
        capture = (1000 * cum_pos) // p
        lift = (1000 * cum_pos * n) // (j * p)
        assert capture >= prev_capture  # monotone capture
        prev_capture = capture
        if j == n:
            assert capture == 1000
            assert lift == 1000  # full corpus = baseline exactly
