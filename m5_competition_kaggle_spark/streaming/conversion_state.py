"""Stateful streaming conversion tracking — per-user funnel minima
across micro-batches.

The second sequence-state operator after
`streaming/transition_state.py`, carrying a DIFFERENT state shape: not
the last event but the running MINIMA (first 'view' instant, first
'purchase' instant) per user — the online form of the x183/x187
conversion-lag readouts, able to answer "who converted, and how fast"
as events arrive instead of in a nightly batch.

Unlike the transition kernel, the minima are ORDER-INSENSITIVE
(min is commutative), so this operator has no cross-batch ordering
contract at all — late or shuffled arrivals still converge to the
same state, which the property test exercises with adversarially
shuffled batches. The batch twin runs the identical kernel per user
over the full timeline (s29's oracle certifies it against pure SQL,
proving the Arrow crossing); the stream carries (v0, p0) in
GroupState and emits each user's refreshed row per micro-batch
(update mode — the LAST emission per user is the answer).

State: two nullable longs per user — bounded, corpus-independent.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

NANOS_PER_MIN = 60_000_000_000

OUT_SCHEMA = (
    "user_id long, v0 long, p0 long, lag_min long"
)
STATE_SCHEMA = "v0 long, p0 long"


def _min_opt(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return min(a, b)


def _firsts_from_frame(
    pdf: pd.DataFrame, v0, p0
) -> tuple[Any, Any]:
    """The shared kernel: fold a batch of (tsn, event_type) rows into
    the running first-view / first-purchase minima. Order-insensitive
    by construction."""
    views = pdf.loc[pdf["event_type"] == "view", "tsn"]
    purch = pdf.loc[pdf["event_type"] == "purchase", "tsn"]
    if len(views):
        v0 = _min_opt(v0, int(views.min()))
    if len(purch):
        p0 = _min_opt(p0, int(purch.min()))
    return v0, p0


def _row(user_id, v0, p0) -> pd.DataFrame:
    lag = (
        (p0 - v0) // NANOS_PER_MIN
        if v0 is not None and p0 is not None and p0 >= v0
        else None
    )
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "v0": [v0],
            "p0": [p0],
            "lag_min": [lag],
        }
    )


def batch_user_conversions(ev: DataFrame) -> DataFrame:
    """Batch grouped-map over full timelines — the certified side.
    Expects (user_id, tsn, event_type) rows already filtered to the
    funnel types; returns one row per user with at least one view:
    (user_id, v0, p0, lag_min) — lag NULL when unconverted or the
    purchase precedes the view (the x183 rule)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        v0, p0 = _firsts_from_frame(pdf, None, None)
        if v0 is None:
            return pd.DataFrame(
                {"user_id": [], "v0": [], "p0": [], "lag_min": []}
            )
        return _row(int(pdf["user_id"].iloc[0]), v0, p0)

    return ev.groupBy("user_id").applyInPandas(run, OUT_SCHEMA)


def _update_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    v0, p0 = state.get if state.exists else (None, None)
    rows = pd.concat(list(pdfs))
    v0, p0 = _firsts_from_frame(rows, v0, p0)
    state.update((v0, p0))
    if v0 is not None:
        yield _row(key[0], v0, p0)
    else:  # purchases-only so far: keep state, emit nothing
        yield pd.DataFrame(
            {"user_id": [], "v0": [], "p0": [], "lag_min": []}
        )


def stateful_user_conversions(events: DataFrame) -> DataFrame:
    """Streaming twin: (v0, p0) carried in GroupState; each
    micro-batch emits the refreshed conversion row for users seen in
    it (update mode — read the LAST row per user)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
