"""Property tests for the staged r10 operators against brute-force
pure-Python references — the randomized hardening layer under the
oracle differential (which fixes ONE dataset; these sweep many).

The references here are deliberately naive (textbook PAV stack, O(n²)
CUSUM scan, O(n² log) Theil–Sen) — slow but obviously correct."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F


def _pav_reference(cells):
    """Textbook pool-adjacent-violators over [(n, n_pos)] by bin
    order → fitted rate per input cell (float)."""
    blocks = []  # (n, pos)
    for n, pos in cells:
        blocks.append([n, pos])
        while len(blocks) >= 2 and (
            blocks[-2][1] * blocks[-1][0]
            > blocks[-1][1] * blocks[-2][0]
        ):  # prev rate > cur rate → pool
            n2, p2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += p2
    # expand: walk the inputs, assigning each cell its block's rate
    expanded = []
    bi, consumed = 0, 0
    for n, pos in cells:
        expanded.append(blocks[bi][1] / blocks[bi][0])
        consumed += n
        if consumed >= blocks[bi][0]:
            consumed = 0
            bi += 1
    return expanded


def test_isotonic_matches_pav_stack_randomized(spark):
    from m5_competition_kaggle_spark.operators.isotonic import (
        isotonic_fit,
    )

    rng = random.Random(20260815)
    for trial in range(6):
        n_bins = rng.randint(2, 12)
        cells = []
        rows = []
        for b in range(n_bins):
            n = rng.randint(1, 9)
            pos = rng.randint(0, n)
            cells.append((n, pos))
            rows += [("g", b, i < pos) for i in range(n)]
        df = spark.createDataFrame(
            rows, "g string, bin int, y boolean"
        )
        got = {
            r["bin"]: r["fitted_permille"]
            for r in isotonic_fit(df, ["g"], "bin", "y").collect()
        }
        want = _pav_reference(cells)
        for b in range(n_bins):
            assert got[b] == math.floor(1000 * want[b]), (
                trial, cells, b, got[b], want[b],
            )


def test_changepoint_matches_brute_force_randomized(spark):
    from m5_competition_kaggle_spark.operators.changepoint import (
        best_mean_shift,
    )

    rng = random.Random(4117)
    rows = []
    expect = {}
    for k in range(5):
        n = rng.randint(2, 40)
        ys = [rng.randint(0, 50) for _ in range(n)]
        rows += [(f"k{k}", t, y) for t, y in enumerate(ys)]
        # brute force: argmax of (n·S_t − t·S_n)²/(t(n−t)), tie → min t
        S = 0
        Sn = sum(ys)
        best = None
        for t in range(1, n):
            S += ys[t - 1]
            g = n * S - t * Sn
            q = (g * g) / (t * (n - t))
            if best is None or q > best[0]:
                best = (q, t, abs(g), t * (n - t))
        expect[f"k{k}"] = best
    df = spark.createDataFrame(rows, "k string, t bigint, y bigint")
    got = {r["k"]: r for r in best_mean_shift(
        df, "k", "t", "y").collect()}
    for k, (q, t, g_abs, den) in expect.items():
        r = got[k]
        assert (r["cp_idx"], r["g_abs"], r["den"]) == (t, g_abs, den), k


def test_theil_sen_matches_brute_force_randomized(spark):
    from m5_competition_kaggle_spark.operators.theil_sen import (
        theil_sen_slope,
    )

    rng = random.Random(90210)
    rows = []
    expect = {}
    for k in range(4):
        n = rng.randint(2, 25)
        pts = [(t, rng.randint(-30, 30)) for t in range(n)]
        rows += [(f"k{k}", t, y) for t, y in pts]
        pairs = []
        for i in range(n):
            for j in range(i + 1, n):
                dy = pts[j][1] - pts[i][1]
                dx = pts[j][0] - pts[i][0]
                pairs.append((dy / dx, pts[i][0], pts[j][0], dy, dx))
        pairs.sort()
        m = pairs[(len(pairs) + 1) // 2 - 1]
        expect[f"k{k}"] = m
    df = spark.createDataFrame(rows, "k string, t bigint, y bigint")
    got = {r["k"]: r for r in theil_sen_slope(
        df, "k", "t", "y").collect()}
    for k, (s, ti, tj, dy, dx) in expect.items():
        r = got[k]
        assert (r["slope_num"], r["slope_den"]) == (dy, dx), k
        # truncation toward zero, matching Spark DIV
        if dy >= 0:
            want_ppm = (1_000_000 * dy) // dx
        else:
            want_ppm = -((1_000_000 * -dy) // dx)
        assert r["slope_ppm"] == want_ppm, k


def test_rbo_integer_weights_match_float_formula(spark):
    """The exact-integer W_num ladder over D = 2520·10⁹ must agree
    with the float RBO formula to float precision for every possible
    (ra, rb) pair at d=10, p=9/10."""
    from m5_competition_kaggle_spark.operators.rbo import (
        _W_NUM,
        RBO_DENOM,
    )

    p = 0.9
    for m in range(1, 11):
        want = sum(p ** (k - 1) / k for k in range(m, 11))
        got = _W_NUM[m] / RBO_DENOM
        assert abs(got - want) < 1e-12, m


def test_adida_equals_ses_over_reconstructed_grid(spark):
    from m5_competition_kaggle_spark.operators.adida import (
        adida_forecast,
    )

    rng = random.Random(777)
    rows = []
    expect = {}
    m, ad = 3, 4
    for k in range(4):
        demands = sorted(
            rng.sample(range(60), rng.randint(1, 12))
        )
        series = [(t, rng.randint(1, 20)) for t in demands]
        rows += [(f"k{k}", t, q) for t, q in series]
        # reference: bucket sums, full grid, integer SES
        bsum: dict = {}
        for t, q in series:
            bsum[t // m] = bsum.get(t // m, 0) + q
        b0, b1 = min(bsum), max(bsum)
        grid = [bsum.get(b, 0) for b in range(b0, b1 + 1)]
        z = grid[0]
        for q in grid[1:]:
            d = q - z
            z += d // ad if d >= 0 else -((-d) // ad)
        expect[f"k{k}"] = (len(grid), len(bsum), z)
    df = spark.createDataFrame(rows, "k string, t bigint, q bigint")
    got = {r["k"]: r for r in adida_forecast(
        df, "k", "t", "q", bucket_days=m, alpha_den=ad).collect()}
    for k, (nb, nz, z) in expect.items():
        r = got[k]
        assert (r["n_buckets"], r["n_nonzero"], r["agg_level"]) == (
            nb, nz, z,
        ), k
