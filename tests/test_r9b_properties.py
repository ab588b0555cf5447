"""Pure-arithmetic properties behind the staged r9b operators —
hypothesis over Python references (no Spark per example, the
test_r9_properties pattern).

1. Cell-based AUC (operators/auc.py): the doubled-U cell walk equals
   the brute-force pair count 2U = Σ 2·[s⁺>s⁻] + [s⁺=s⁻], and
   label-flip complementarity 2U + 2U' = 2·n_pos·n_neg holds exactly.
2. ECE telescoping (operators/ece.py): Σ_b |1000·n_pos − score_sum|
   equals 1000·Σ_b n_b·|acc_b − conf_b| computed in exact fractions —
   the no-truncation claim, verified.
3. α-multiplied Winkler (operators/interval_score.py): w = α·W
   exactly (fraction reference); non-negative; zero penalty ⟺ the
   outcome is covered; (y,l,u) ↦ (−y,−u,−l) symmetry.
4. SBC thresholds (operators/intermittency.py): the integer
   cross-multiplications decide exactly the fraction comparisons
   ADI ≥ 132/100 and CV² ≥ 49/100.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

labeled = st.lists(
    st.tuples(st.integers(-50, 50), st.booleans()),
    min_size=1,
    max_size=60,
)


def _auc_2u_cells(rows: list[tuple[int, bool]]) -> int:
    """operators/auc.py arithmetic: cells ordered by score, cumneg
    strictly below, 2U = Σ 2·np·cumneg + np·nn."""
    cells: dict[int, list[int]] = {}
    for s, pos in rows:
        c = cells.setdefault(s, [0, 0])
        c[0 if pos else 1] += 1
    u2, cumneg = 0, 0
    for s in sorted(cells):
        np_, nn = cells[s]
        u2 += 2 * np_ * cumneg + np_ * nn
        cumneg += nn
    return u2


@settings(max_examples=300, deadline=None)
@given(labeled)
def test_auc_cells_equal_brute_force_pairs(rows):
    pos = [s for s, p in rows if p]
    neg = [s for s, p in rows if not p]
    brute = sum(
        2 * (sp > sn) + (sp == sn) for sp in pos for sn in neg
    )
    assert _auc_2u_cells(rows) == brute


@settings(max_examples=300, deadline=None)
@given(labeled)
def test_auc_label_flip_complement(rows):
    flipped = [(s, not p) for s, p in rows]
    n_pos = sum(1 for _, p in rows if p)
    n_neg = len(rows) - n_pos
    assert (
        _auc_2u_cells(rows) + _auc_2u_cells(flipped)
        == 2 * n_pos * n_neg
    )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.booleans()),
        min_size=1,
        max_size=80,
    ),
    st.integers(1, 200),
)
def test_ece_telescopes_exactly(rows, width):
    bins: dict[int, list[int]] = {}
    for s, pos in rows:
        b = bins.setdefault(s // width, [0, 0, 0])
        b[0] += 1
        b[1] += int(pos)
        b[2] += s
    int_sum = sum(abs(1000 * np_ - ss) for _, np_, ss in bins.values())
    frac_sum = sum(
        n * abs(Fraction(np_, n) - Fraction(ss, 1000 * n))
        for n, np_, ss in bins.values()
    )
    assert Fraction(int_sum, 1000) == frac_sum


@settings(max_examples=300, deadline=None)
@given(
    st.integers(-10_000, 10_000),   # y
    st.integers(-10_000, 10_000),   # lo
    st.integers(0, 20_000),         # width (hi = lo + width)
    st.integers(2, 998),            # alpha permille
)
def test_winkler_alpha_multiplied_identity(y, lo, width, alpha):
    hi = lo + width
    w = (
        alpha * (hi - lo)
        + 2000 * max(lo - y, 0)
        + 2000 * max(y - hi, 0)
    )
    # classical W = (u−l) + (2/α)(l−y)₊ + (2/α)(y−u)₊, α as fraction
    a = Fraction(alpha, 1000)
    W = (
        (hi - lo)
        + Fraction(2, 1) / a * max(lo - y, 0)
        + Fraction(2, 1) / a * max(y - hi, 0)
    )
    assert Fraction(w, alpha) == W
    assert w >= alpha * (hi - lo) >= 0
    covered = lo <= y <= hi
    assert (w == alpha * (hi - lo)) == covered
    # reflection symmetry
    w_ref = (
        alpha * (hi - lo)
        + 2000 * max((-y) - (-lo), 0)
        + 2000 * max((-hi) - (-y), 0)
    )
    assert w_ref == w


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5000), st.integers(1, 10_000)),
        min_size=2,
        max_size=50,
        unique_by=lambda tq: tq[0],
    )
)
def test_sbc_thresholds_match_fraction_comparisons(demands):
    demands = sorted(demands)
    ts = [t for t, _ in demands]
    qs = [q for _, q in demands]
    n = len(demands)
    span = ts[-1] - ts[0]
    sq, sq2 = sum(qs), sum(q * q for q in qs)
    adi_int = 100 * span >= 132 * (n - 1)
    adi_frac = Fraction(span, n - 1) >= Fraction(132, 100)
    assert adi_int == adi_frac
    cv2_int = 100 * (n * sq2 - sq * sq) >= 49 * sq * sq
    cv2_frac = (
        Fraction(n * sq2 - sq * sq, sq * sq) >= Fraction(49, 100)
    )
    assert cv2_int == cv2_frac
