"""Pure-arithmetic properties behind the r9 operators — hypothesis
over Python references (no Spark per example, the test_r8_properties
pattern).

1. Croston recurrence (operators/croston.py): constant demand at a
   constant cadence is a FIXED POINT (z = q, p = g forever), and the
   levels never escape the envelope of their inputs — truncating
   division moves toward the target without overshoot, so
   min ≤ level ≤ max holds for sizes and (post-init) intervals.
2. Pinball loss (operators/pinball.py): non-negative, zero iff
   y = f; the u ↔ 1000−u / (y,f) ↔ (f,y) symmetry; the type-1
   quantile rank k = ceil(u·n/1000) stays in [1, n] and the
   resulting forecast is non-decreasing in u.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _idiv(a: int, b: int) -> int:
    """Truncating integer division (Spark DIV / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def _croston(demands: list[tuple[int, int]], ad: int = 4):
    """Python reference of operators/croston.py::croston_forecast."""
    (t0, q0), rest = demands[0], demands[1:]
    z, p, pt = q0, -1, t0
    for t, q in rest:
        i = t - pt
        z = z + _idiv(q - z, ad)
        p = i if p == -1 else p + _idiv(i - p, ad)
        pt = t
    return z, p


@settings(max_examples=300, deadline=None)
@given(
    st.integers(1, 1000),      # constant demand size
    st.integers(1, 365),       # constant cadence
    st.integers(1, 40),        # number of demands
    st.integers(1, 8),         # alpha_den
)
def test_croston_constant_series_is_fixed_point(q, g, n, ad):
    demands = [(k * g, q) for k in range(n)]
    z, p = _croston(demands, ad)
    assert z == q
    assert p == (-1 if n == 1 else g)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 400), st.integers(1, 10_000)),
        min_size=2,
        max_size=50,
    ),
    st.integers(1, 8),
)
def test_croston_levels_stay_in_input_envelope(gaps_sizes, ad):
    # build strictly increasing times from positive gaps
    t, demands = 0, []
    for gap, q in gaps_sizes:
        demands.append((t, q))
        t += gap
    z, p = _croston(demands, ad)
    sizes = [q for _, q in demands]
    assert min(sizes) <= z <= max(sizes)
    gaps = [b[0] - a[0] for a, b in zip(demands, demands[1:])]
    assert min(gaps) <= p <= max(gaps)
    assert p >= 1  # the forecast denominator contract


def _pin(u: int, y: int, f: int) -> int:
    return u * (y - f) if y >= f else (1000 - u) * (f - y)


@settings(max_examples=500, deadline=None)
@given(
    st.integers(1, 999),
    st.integers(-10**9, 10**9),
    st.integers(-10**9, 10**9),
)
def test_pinball_nonneg_zero_iff_equal_and_symmetric(u, y, f):
    p = _pin(u, y, f)
    assert p >= 0
    assert (p == 0) == (y == f)
    assert p == _pin(1000 - u, f, y)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=60),
    st.lists(st.integers(1, 999), min_size=2, max_size=6, unique=True),
)
def test_quantile_rank_bounds_and_forecast_monotone_in_u(ys, us):
    n = len(ys)
    ordered = sorted(ys)
    fcsts = []
    for u in sorted(us):
        k = (u * n + 999) // 1000
        assert 1 <= k <= n
        fcsts.append(ordered[k - 1])
    assert fcsts == sorted(fcsts)
