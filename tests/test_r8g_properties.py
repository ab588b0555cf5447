"""Pure-arithmetic properties behind the remaining r8 operators —
hypothesis over Python references (no Spark per example, the
test_r8_properties pattern).

1. Largest-remainder apportionment satisfies the QUOTA property
   (every share is floor or ceil of its exact proportional quota)
   and always sums to the budget — the two theorems that define
   Hamilton's method.
2. Welch t² from integer sufficient statistics is invariant under a
   common shift and a common positive scaling of the quantized
   metric, and exactly 0 for identical arms.
3. Leave-one-out target encoding: algebraic identities loo_num + y_i
   = S_g and Σ_g loo_num = (n-1)·S_g hold for every group.
4. RMSSE fixed points: the naive persistence forecaster scores
   exactly 1e6 ppm when the scale and error windows coincide; a
   perfect forecaster scores exactly 0.
5. The Benford expectation table IS floor(1000·log10(1+1/d)).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# ----------------------------------------------------------- apportion


def _hamilton(weights: list[int], budget: int):
    """Python reference mirroring operators/apportion.py."""
    w_total = sum(weights)
    floor = [budget * w // w_total for w in weights]
    rem = [(budget * w) % w_total for w in weights]
    leftover = budget - sum(floor)
    order = sorted(
        range(len(weights)), key=lambda i: (-rem[i], i)
    )
    share = list(floor)
    for i in order[:leftover]:
        if rem[i] > 0:
            share[i] += 1
    return share


@settings(max_examples=500, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=30).filter(
        lambda ws: sum(ws) > 0
    ),
    st.integers(0, 100_000),
)
def test_apportion_sums_to_budget_and_satisfies_quota(ws, budget):
    share = _hamilton(ws, budget)
    assert sum(share) == budget
    w_total = sum(ws)
    for w, s in zip(ws, share):
        q = budget * w / w_total
        assert math.floor(q) <= s <= math.ceil(q)
        if w == 0:
            assert s == 0


# --------------------------------------------------------------- welch


def _welch_t2(a: list[int], b: list[int]):
    """Python reference mirroring operators/abtest._welch_t2 (same
    expression shape over the integer sufficient statistics)."""
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    ssa = sum(x * x for x in a)
    ssb = sum(x * x for x in b)
    if na < 2 or nb < 2:
        return None
    va = (ssa - sa * sa / na) / (na - 1)
    vb = (ssb - sb * sb / nb) / (nb - 1)
    den = va / na + vb / nb
    if not den > 0:
        return None
    ma, mb = sa / na, sb / nb
    return (ma - mb) * (ma - mb) / den


arm = st.lists(st.integers(-1000, 1000), min_size=2, max_size=40)


@settings(max_examples=300, deadline=None)
@given(arm, arm, st.integers(-500, 500), st.integers(1, 20))
def test_welch_shift_and_scale_invariant(a, b, shift, scale):
    t = _welch_t2(a, b)
    t_shift = _welch_t2([x + shift for x in a], [x + shift for x in b])
    t_scale = _welch_t2([x * scale for x in a], [x * scale for x in b])
    if t is None:
        assert t_shift is None and t_scale is None
        return
    assert abs(t_shift - t) <= 1e-6 * max(1.0, abs(t))
    assert abs(t_scale - t) <= 1e-6 * max(1.0, abs(t))


@settings(max_examples=200, deadline=None)
@given(arm)
def test_welch_identical_arms_zero_or_undefined(a):
    t = _welch_t2(a, list(a))
    assert t is None or t == 0.0


# ------------------------------------------------------- target encode


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-10_000, 10_000), min_size=2, max_size=50))
def test_loo_identities(ys):
    s = sum(ys)
    n = len(ys)
    loo_nums = [s - y for y in ys]
    assert all(num + y == s for num, y in zip(loo_nums, ys))
    assert sum(loo_nums) == (n - 1) * s
    # each loo mean excludes exactly its own observation
    for y, num in zip(ys, loo_nums):
        assert num == sum(v for i, v in enumerate(ys)) - y


# --------------------------------------------------------------- rmsse


def _rmsse_ppm(y: list[int], yhat: list[int | None], in_scale=None):
    """Python reference mirroring operators/rmsse.py."""
    sse = n_scored = scale = n_scale = 0
    for i in range(len(y)):
        if i > 0 and (in_scale is None or in_scale[i]):
            d = y[i] - y[i - 1]
            scale += d * d
            n_scale += 1
        if yhat[i] is not None:
            e = y[i] - yhat[i]
            sse += e * e
            n_scored += 1
    if n_scored == 0 or n_scale == 0 or scale == 0:
        return None
    return round(1e6 * math.sqrt((sse / n_scored) / (scale / n_scale)))


series = st.lists(st.integers(0, 1000), min_size=3, max_size=60)


@settings(max_examples=300, deadline=None)
@given(series)
def test_rmsse_naive_forecaster_scores_exactly_one(ys):
    yhat = [None] + [ys[i - 1] for i in range(1, len(ys))]
    ppm = _rmsse_ppm(ys, yhat)
    if ppm is None:  # constant series: no naive error to scale by
        assert len(set(ys)) == 1
        return
    assert ppm == 1_000_000


@settings(max_examples=300, deadline=None)
@given(series)
def test_rmsse_perfect_forecaster_scores_zero(ys):
    ppm = _rmsse_ppm(ys, list(ys))
    assert ppm is None or ppm == 0
    if len(set(ys)) > 1:
        assert ppm == 0


# -------------------------------------------------------------- benford


def test_benford_expectation_table_is_the_log_law():
    from m5_competition_kaggle_spark.operators.benford import (
        BENFORD_PERMILLE,
    )

    assert BENFORD_PERMILLE == tuple(
        math.floor(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)
    )
    # the law is a (floor-rounded) probability distribution
    assert 995 <= sum(BENFORD_PERMILLE) <= 1000


# ------------------------------------------------------- cusum identity


def _cusum_direct(vals, mu):
    """The textbook recurrence C_t = max(0, C_{t-1} + (v - mu))."""
    c, out = 0, []
    for v in vals:
        c = max(0, c + (v - mu))
        out.append(c)
    return out


def _cusum_prefix_min(vals, mu, p0=0, m0=0):
    """The streaming kernel's identity (streaming/cusum_state.py):
    C = P - min(0, m) with P the running prefix sum and m its running
    minimum — the form that carries TWO int64s of state per key."""
    out, p, m = [], p0, m0
    for v in vals:
        p += v - mu
        m = min(m, p)
        out.append(p - min(0, m))
    return out


@settings(max_examples=500, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=80),
    st.integers(-100, 100),
)
def test_cusum_prefix_min_identity(vals, mu):
    assert _cusum_prefix_min(vals, mu) == _cusum_direct(vals, mu)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=2, max_size=60),
    st.integers(-100, 100),
    st.integers(1, 50),
)
def test_cusum_chunk_invariance(vals, mu, cut):
    """Carrying (p, m) across an arbitrary chunk boundary reproduces
    the unchunked trajectory — the property that makes the batch
    kernel and the GroupState streaming kernel the same computation."""
    cut = cut % len(vals)
    whole = _cusum_prefix_min(vals, mu)
    p = sum(v - mu for v in vals[:cut])
    m = 0
    run = 0
    for v in vals[:cut]:
        run += v - mu
        m = min(m, run)
    chunked = _cusum_prefix_min(vals[:cut], mu) + _cusum_prefix_min(
        vals[cut:], mu, p0=p, m0=m
    )
    assert chunked == whole
