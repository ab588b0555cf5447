"""Streaming CUSUM drift monitor — constant-size state per key.

The online form of x101's change-point statistic. Against a FIXED
reference level mu (the production setup: mu comes from a trained
baseline, not from the stream itself), the classical recurrence

    C_t = max(0, C_{t-1} + (v_t − mu))

needs exactly TWO int64s of carried state per key (the running prefix
sum P and its running minimum m, C = P − min(0, m)) — the textbook
example of why ``applyInPandasWithState`` exists: unbounded input,
O(1) state, not expressible as a watermarked aggregate.

Same shared-kernel discipline as ``streaming/anomaly_state.py``: ONE
numpy kernel runs under the batch grouped-map (s16's certified path)
and under GroupState streaming; the pytest proves cross-batch state
equals the batch computation bit-for-bit. All arithmetic int64
(milli-quantized values, integer mu), so the batch twin certifies
against an ANSI-SQL twin.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "group string, event_id long, tsn long, v long, cusum long"
)


def _cusum_kernel(
    vals: pd.Series, mu: int, p0: int, m0: int
) -> tuple[pd.DataFrame, int, int]:
    """CUSUM over one ordered chunk given carried (p, m) state.
    Returns (frame with cusum column, new p, new m)."""
    d = vals.astype("int64") - int(mu)
    p = d.cumsum() + int(p0)
    m = p.cummin().clip(upper=int(m0))
    cus = p - m.clip(upper=0)
    new_p = int(p.iloc[-1]) if len(p) else int(p0)
    new_m = int(m.iloc[-1]) if len(m) else int(m0)
    return pd.DataFrame({"cusum": cus}), new_p, new_m


def batch_cusum(
    df: DataFrame,
    group_col: str,
    value_col: str,
    mu: int,
    order_cols: tuple[str, ...] = ("tsn", "event_id"),
) -> DataFrame:
    """Batch grouped-map twin (s16): per-key CUSUM against the fixed
    reference ``mu``, same output as the streaming form."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        res, _, _ = _cusum_kernel(
            pdf[value_col].reset_index(drop=True), mu, 0, 0
        )
        return pd.DataFrame(
            {
                "group": pdf[group_col].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "tsn": pdf["tsn"].to_numpy(),
                "v": pdf[value_col].to_numpy(),
                "cusum": res["cusum"].to_numpy(),
            }
        )

    return df.groupBy(group_col).applyInPandas(per_group, OUT_SCHEMA)


def streaming_cusum(
    events: DataFrame,
    group_col: str,
    value_col: str,
    mu: int,
) -> DataFrame:
    """Streaming form: two int64s of GroupState per key, kernel shared
    with :func:`batch_cusum`."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        p0, m0 = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["tsn", "event_id"], kind="mergesort")
            res, p0, m0 = _cusum_kernel(
                pdf[value_col].reset_index(drop=True), mu, p0, m0
            )
            yield pd.DataFrame(
                {
                    "group": pdf[group_col].to_numpy(),
                    "event_id": pdf["event_id"].to_numpy(),
                    "tsn": pdf["tsn"].to_numpy(),
                    "v": pdf[value_col].to_numpy(),
                    "cusum": res["cusum"].to_numpy(),
                }
            )
        state.update((int(p0), int(m0)))

    return events.groupBy(group_col).applyInPandasWithState(
        update,
        OUT_SCHEMA,
        "p long, m long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
