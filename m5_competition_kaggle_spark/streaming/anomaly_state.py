"""Stateful streaming anomaly detection — the fourth streaming
integration style in the engine: a PANDAS kernel shared verbatim
between a batch grouped-map (``applyInPandas``, the certified path —
s14) and a cross-batch stateful stream
(``applyInPandasWithState`` carrying the trailing window in
GroupState).

The kernel is the integer z-test of ``operators/anomaly.py``
((n·v − S)² > z²·(n·SS − S²) over the trailing ``window`` predecessors,
excluding the current row), computed here in numpy int64 so the Arrow
crossing itself is certified: s14's oracle is the SAME SQL twin shape
as x85's, which means the pandas implementation is proven equal to the
pure-Catalyst implementation bit-for-bit — exactly the guarantee you
want before trusting the streaming variant, whose state (the last
``window`` values per key) cannot be expressed without a custom
stateful operator.

State size: ``window`` int64 values per group key — bounded, corpus-
size-independent. Within-batch and cross-batch results agree as long
as events arrive per-key in event-time order (the test feeds batches
in order; production fronts this with a watermarked sort, same caveat
as every ordered-state operator).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "group string, event_id long, tsn long, v long, "
    "win_n long, win_sum long, is_anomaly boolean"
)


def _flags_kernel(
    vals: "pd.Series", window: int, min_n: int, z: int, prefix: list[int]
) -> pd.DataFrame:
    """Trailing-window flags for one ordered value series. ``prefix``
    is the carried state: up to ``window`` values preceding this chunk
    (empty for the batch path)."""
    import numpy as np

    v = pd.concat([pd.Series(prefix, dtype="int64"), vals.astype("int64")],
                  ignore_index=True)
    # Quantization-contract guard (ADVICE r6): the rolling sums below
    # come back float64 and are exact only while window * max|v|^2 (and
    # window * max|v|) stay below 2^53. A caller violating that must
    # fail loudly here, not silently diverge from the certified
    # Catalyst/SQL twin.
    if len(v):
        vm = int(v.abs().max())
        if vm * vm * window >= 2**53 or vm * window >= 2**53:
            raise ValueError(
                f"quantization contract violated: window={window} * "
                f"max|v|^2 (|v| up to {vm}) reaches 2^53; float64 "
                "rolling sums would lose exactness — quantize values "
                "coarser or shrink the window"
            )
    skip = len(prefix)
    s = v.shift(1).rolling(window, min_periods=1).sum()
    ss = (v * v).shift(1).rolling(window, min_periods=1).sum()
    n = v.shift(1).rolling(window, min_periods=1).count()
    # rolling sums of int64 come back float64 — exact below 2^53, and
    # the caller's quantization contract keeps W·V² far below that.
    n = n.fillna(0).astype("int64")
    s = s.fillna(0).astype("int64")
    ss = ss.fillna(0).astype("int64")
    dev = n * v - s
    var_n2 = n * ss - s * s
    flag = (n >= min_n) & (dev * dev > (z * z) * var_n2)
    out = pd.DataFrame(
        {"v": v, "win_n": n, "win_sum": s, "is_anomaly": flag}
    )
    return out.iloc[skip:].reset_index(drop=True)


def batch_anomaly_flags(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_cols: tuple[str, ...] = ("tsn", "event_id"),
    window: int = 50,
    min_n: int = 10,
    z: int = 3,
) -> DataFrame:
    """Batch grouped-map twin (s14): same output columns as the
    Catalyst implementation (x85), computed by the pandas kernel."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        res = _flags_kernel(
            pdf[value_col].reset_index(drop=True), window, min_n, z, []
        )
        return pd.DataFrame(
            {
                "group": pdf[group_col].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "tsn": pdf["tsn"].to_numpy(),
                "v": res["v"].to_numpy(),
                "win_n": res["win_n"].to_numpy(),
                "win_sum": res["win_sum"].to_numpy(),
                "is_anomaly": res["is_anomaly"].to_numpy(),
            }
        )

    return df.groupBy(group_col).applyInPandas(per_group, OUT_SCHEMA)


def streaming_anomaly_flags(
    events: DataFrame,
    group_col: str,
    value_col: str,
    window: int = 50,
    min_n: int = 10,
    z: int = 3,
) -> DataFrame:
    """Streaming form: the same kernel under ``applyInPandasWithState``
    with the trailing ``window`` values carried in GroupState."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (prefix,) = state.get if state.exists else ([],)
        prefix = list(prefix)
        for pdf in pdfs:
            pdf = pdf.sort_values(["tsn", "event_id"], kind="mergesort")
            res = _flags_kernel(
                pdf[value_col].reset_index(drop=True),
                window, min_n, z, prefix,
            )
            vals = prefix + [int(x) for x in pdf[value_col]]
            prefix = vals[-window:]
            yield pd.DataFrame(
                {
                    "group": pdf[group_col].to_numpy(),
                    "event_id": pdf["event_id"].to_numpy(),
                    "tsn": pdf["tsn"].to_numpy(),
                    "v": res["v"].to_numpy(),
                    "win_n": res["win_n"].to_numpy(),
                    "win_sum": res["win_sum"].to_numpy(),
                    "is_anomaly": res["is_anomaly"].to_numpy(),
                }
            )
        state.update((prefix,))

    return events.groupBy(group_col).applyInPandasWithState(
        update,
        OUT_SCHEMA,
        "prefix array<long>",
        "append",
        GroupStateTimeout.NoTimeout,
    )
