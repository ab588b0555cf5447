"""Pure-arithmetic properties behind the r8-queue d/e/f batches —
hypothesis over Python references (no Spark per example, the
test_r8_properties pattern).

1. Linear interpolation: the floor quotient always lies in
   [min(y_prev, y_next), max(y_prev, y_next)], and the rational is
   exact at both flanks.
2. Conformal rank: the integer ceil formula matches math.ceil, and on
   distinct scores the k-th order statistic covers exactly k points
   (the finite-sample coverage identity).
3. ESS: Cauchy-Schwarz bounds — 1 <= ESS <= n for positive integer
   weights, with equality at n iff all weights equal.
4. Poisson permille CDF: the pmf partitions 1000 exactly and its mean
   is 1 to within quantization (the bootstrap's statistical anchor).
5. Kaplan-Meier: survival is non-increasing, inside [0, 1e6], and the
   ln-sum formulation agrees with the direct product to < 1 ppm.
6. MMR: published mmr2 always reconstructs from the published picks;
   the first pick is the relevance argmax; picks are distinct.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# ------------------------------------------------------ interpolation

flanks = st.tuples(
    st.integers(-50, 50),                 # t_prev
    st.integers(1, 40),                   # gap to t (>=1)
    st.integers(1, 40),                   # gap from t to t_next
    st.integers(-10**9, 10**9),           # y_prev
    st.integers(-10**9, 10**9),           # y_next
)


@settings(max_examples=500, deadline=None)
@given(flanks)
def test_interp_quotient_bounded_by_flanks(args):
    tp, g1, g2, yp, yn = args
    t, tn = tp + g1, tp + g1 + g2
    num = yp * (tn - tp) + (yn - yp) * (t - tp)
    den = tn - tp
    q = num // den  # python floor == the operators' DIV on positives;
    # for negative num both engines truncate, which stays in-bounds
    # because the true rational is in [min, max] and both are ints
    qt = int(num / den) if num < 0 else q
    for cand in {q, qt}:
        assert min(yp, yn) <= cand <= max(yp, yn)


@settings(max_examples=200, deadline=None)
@given(flanks)
def test_interp_exact_at_flanks(args):
    tp, g1, g2, yp, yn = args
    tn = tp + g1 + g2
    den = tn - tp
    # at t = t_prev the rational is exactly y_prev; at t_next, y_next
    assert (yp * den + (yn - yp) * 0) / den == yp
    assert (yp * den + (yn - yp) * den) / den == yn


# ---------------------------------------------------------- conformal


@settings(max_examples=500, deadline=None)
@given(st.integers(1, 10_000), st.integers(1, 99), st.integers(2, 100))
def test_conformal_rank_formula(n, an, ad):
    if an >= ad:
        an = ad - 1
    k = ((n + 1) * (ad - an) + ad - 1) // ad
    assert k == math.ceil((n + 1) * (ad - an) / ad)
    assert 1 <= k <= n + 1


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(-10**6, 10**6), min_size=1, max_size=200))
def test_conformal_coverage_identity_on_distinct_scores(scores):
    s = sorted(scores)
    n = len(s)
    k = ((n + 1) * 9 + 9) // 10  # alpha = 1/10
    if k > n:
        return
    q_hat = s[k - 1]
    assert sum(1 for x in s if x <= q_hat) == k


# --------------------------------------------------------------- ess


@settings(max_examples=500, deadline=None)
@given(st.lists(st.integers(1, 10**6), min_size=1, max_size=100))
def test_ess_cauchy_schwarz_bounds(ws):
    n = len(ws)
    num = sum(ws) ** 2
    den = sum(w * w for w in ws)
    assert den <= num <= n * den  # 1 <= ESS <= n
    if len(set(ws)) == 1:
        assert num == n * den  # equal weights: ESS == n exactly


# ------------------------------------------------------------ poisson


def test_poisson_permille_pmf_partitions_and_mean_is_one():
    from m5_competition_kaggle_spark.operators.bootstrap import (
        POISSON1_CDF_PERMILLE,
    )

    cdf = (0,) + POISSON1_CDF_PERMILLE + (1000,)
    pmf = [cdf[i + 1] - cdf[i] for i in range(len(cdf) - 1)]
    assert all(p >= 0 for p in pmf)
    assert sum(pmf) == 1000
    mean_permille = sum(k * p for k, p in enumerate(pmf))
    assert abs(mean_permille - 1000) <= 10
    # each permille threshold is the true Poisson(1) CDF to ±1
    for k, c in enumerate(POISSON1_CDF_PERMILLE):
        true_cdf = sum(
            math.exp(-1) / math.factorial(i) for i in range(k + 1)
        )
        assert abs(c - 1000 * true_cdf) <= 1


# ----------------------------------------------------------------- km

cohorts = st.lists(
    st.tuples(st.integers(0, 30), st.booleans()),
    min_size=1, max_size=120,
)


def _km_reference(subjects):
    """Direct product-limit over (duration, death) subjects —
    mirrors operators/survival.km_curve's arithmetic."""
    from collections import Counter

    deaths = Counter(t for t, e in subjects if e)
    alls = Counter(t for t, _ in subjects)
    total = len(subjects)
    out, s, seen = [], 1.0, 0
    for t in sorted(alls):
        n_risk = total - seen
        d = deaths.get(t, 0)
        if d > 0:
            if d >= n_risk:
                s = 0.0
            else:
                s *= (n_risk - d) / n_risk
            out.append((t, n_risk, d, s))
        seen += alls[t]
    return out


@settings(max_examples=300, deadline=None)
@given(cohorts)
def test_km_monotone_bounded_and_lnsum_agrees(subjects):
    curve = _km_reference(subjects)
    prev = 1.0
    ln_acc = 0.0
    for t, n_risk, d, s in curve:
        assert 0.0 <= s <= prev <= 1.0
        assert 1 <= d <= n_risk
        # the operators' ln-sum formulation (modulo the explicit
        # extinction flag) matches the direct product to < 1 ppm
        if d < n_risk:
            ln_acc += math.log((n_risk - d) / n_risk)
            assert abs(math.exp(ln_acc) - s) < 1e-6
        else:
            assert s == 0.0
        prev = s


# ---------------------------------------------------------------- mmr

mmr_groups = st.lists(
    st.tuples(
        st.integers(-1000, 1000),                       # rel
        st.lists(st.integers(-50, 50), min_size=3, max_size=3),
    ),
    min_size=1, max_size=12,
)


def _mmr_reference(items, k=3, ln=1, lc=1):
    """Greedy MMR mirroring operators/mmr.py (ids = list index)."""
    import numpy as np

    rel = np.array([r for r, _ in items], dtype=np.int64)
    v = np.array([q for _, q in items], dtype=np.int64)
    sims = v @ v.T
    taken, out = [], []
    for rank in range(1, min(k, len(items)) + 1):
        ms = (
            sims[:, taken].max(axis=1)
            if taken
            else np.zeros(len(items), dtype=np.int64)
        )
        score = ln * rel - lc * ms
        score[taken] = np.iinfo(np.int64).min
        pick = int(np.argmax(score))
        out.append((rank, pick, int(rel[pick]), int(ms[pick]),
                    int(score[pick])))
        taken.append(pick)
    return out


@settings(max_examples=300, deadline=None)
@given(mmr_groups)
def test_mmr_reconstructs_and_first_pick_is_argmax(items):
    out = _mmr_reference(items)
    picks = [p for _, p, _, _, _ in out]
    assert len(set(picks)) == len(picks)  # distinct selections
    # first pick: max rel, ties to lowest index
    rels = [r for r, _ in items]
    best = max(rels)
    assert picks[0] == rels.index(best)
    assert out[0][3] == 0  # round-1 max_sim is zero
    # every published score reconstructs from published components
    for rank, pick, rel, ms, mmr2 in out:
        assert mmr2 == 1 * rel - 1 * ms
