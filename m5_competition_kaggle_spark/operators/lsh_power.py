"""Integer LSH band-capture curves — the S-curve 1 − (1 − j^r)^b that
turns an observed Jaccard-similarity mass (x159's sweep) into a
concrete (bands, rows-per-band) choice for the MinHash pipeline (x2's
b=4, r=4 is one point of this family).

The capture probability is usually quoted as a float; certifying it
bit-exactly across Spark and DuckDB instead uses a TRUNCATING ppm
recurrence: with M = 10⁶ and mul(a, b) = (a·b) div M, powers are
computed by binary squaring in a FIXED chain order, so every
intermediate stays inside int64 (a, b ≤ M ⇒ a·b ≤ 10¹²) and both
engines evaluate the identical expression tree. Truncation error is
bounded by the chain depth (≤ 4 squarings per side ⇒ ≤ 4 ppm + the
amplification of earlier truncation — at most ~0.1% of full scale,
irrelevant for threshold tuning and DISCLOSED as the contract: the
certified value IS the recurrence, which any engine reproduces).

Supported exponents are powers of two (the n_hashes = 16 = b·r grid:
r ∈ {1,2,4,8}, b ∈ {2,4,8,16}) — exactly the squaring chain, no mixed
multiply steps to keep in sync across engines.

Scale: the expression is per-row arithmetic on an already-bounded
pair sample; nothing here shuffles.
"""

from __future__ import annotations

_M = 1_000_000  # ppm scale


def _pow_ppm(expr: str, e: int, div: str) -> str:
    """``expr`` (a ppm value, as engine-neutral SQL text) raised to a
    power-of-two exponent under the truncating ppm product. ``div`` is
    the engine's integer-division operator ('DIV' for Spark SQL, '//'
    for DuckDB) — the ONLY dialect difference, so both engines get the
    same tree."""
    if e < 1 or (e & (e - 1)) != 0:
        raise ValueError("exponent must be a power of two")
    out = f"({expr})"
    while e > 1:
        out = f"(({out} * {out}) {div} {_M})"
        e //= 2
    return out


def capture_ppm_sql(jac_permille_expr: str, r: int, b: int,
                    div: str) -> str:
    """SQL text for the ppm capture probability of an LSH family with
    ``b`` bands × ``r`` rows/band at exact Jaccard
    ``jac_permille_expr`` (a permille int): M − (M − j_ppm^r)^b under
    the truncating recurrence. Both exponents must be powers of two."""
    j_ppm = f"(({jac_permille_expr}) * 1000)"
    p_r = _pow_ppm(j_ppm, r, div)
    miss = f"({_M} - {p_r})"
    miss_b = _pow_ppm(miss, b, div)
    return f"({_M} - {miss_b})"
