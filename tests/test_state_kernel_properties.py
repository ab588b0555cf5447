"""Chunk-invariance property tests for the shared stateful kernels
(``streaming/anomaly_state.py``, ``streaming/cusum_state.py``).

The streaming forms split one ordered series across arbitrary
micro-batch boundaries and carry state between them; correctness
demands the result be IDENTICAL for EVERY split of the series — the
single mid-split pytest exercises one boundary, these exercise
hypothesis-chosen ones. Pure pandas (no Spark session), so they run in
milliseconds and shrink failures to minimal series."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from m5_competition_kaggle_spark.streaming.anomaly_state import (
    _flags_kernel,
)
from m5_competition_kaggle_spark.streaming.cusum_state import (
    _cusum_kernel,
)

series = st.lists(
    st.integers(min_value=-1_000_000, max_value=1_000_000),
    min_size=1,
    max_size=60,
)


@given(
    vals=series,
    cut_frac=st.floats(min_value=0.0, max_value=1.0),
    window=st.integers(min_value=1, max_value=10),
)
@settings(max_examples=200, deadline=None)
def test_cusum_kernel_chunk_invariant(vals, cut_frac, window):
    mu = 100
    whole, _, _ = _cusum_kernel(pd.Series(vals, dtype="int64"), mu, 0, 0)
    cut = int(len(vals) * cut_frac)
    a, p, m = _cusum_kernel(pd.Series(vals[:cut], dtype="int64"), mu, 0, 0)
    b, _, _ = _cusum_kernel(pd.Series(vals[cut:], dtype="int64"), mu, p, m)
    rejoined = pd.concat([a["cusum"], b["cusum"]], ignore_index=True)
    assert rejoined.tolist() == whole["cusum"].tolist()
    assert all(c >= 0 for c in whole["cusum"])  # CUSUM is non-negative


@given(
    vals=series,
    cut_frac=st.floats(min_value=0.0, max_value=1.0),
    window=st.integers(min_value=1, max_value=10),
)
@settings(max_examples=200, deadline=None)
def test_flags_kernel_chunk_invariant(vals, cut_frac, window):
    s = pd.Series(vals, dtype="int64")
    whole = _flags_kernel(s, window, 2, 3, [])
    cut = int(len(vals) * cut_frac)
    a = _flags_kernel(pd.Series(vals[:cut], dtype="int64"),
                      window, 2, 3, [])
    carried = vals[:cut][-window:]
    b = _flags_kernel(pd.Series(vals[cut:], dtype="int64"),
                      window, 2, 3, list(carried))
    for col in ("win_n", "win_sum", "is_anomaly"):
        rejoined = pd.concat([a[col], b[col]], ignore_index=True)
        assert rejoined.tolist() == whole[col].tolist(), col


@given(vals=series)
@settings(max_examples=100, deadline=None)
def test_flags_kernel_matches_bruteforce(vals):
    window, min_n, z = 5, 2, 3
    out = _flags_kernel(pd.Series(vals, dtype="int64"),
                        window, min_n, z, [])
    for t, v in enumerate(vals):
        w = vals[max(0, t - window):t]
        n = len(w)
        s = sum(w)
        ss = sum(x * x for x in w)
        expect = n >= min_n and (n * v - s) ** 2 > z * z * (n * ss - s * s)
        assert bool(out["is_anomaly"].iloc[t]) == expect, t
