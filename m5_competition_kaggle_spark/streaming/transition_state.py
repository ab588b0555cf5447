"""Stateful streaming transition extraction — per-user event-grammar
pairs across micro-batches.

The sequence twin of `streaming/anomaly_state.py` (the engine's fourth
streaming integration style): extracting consecutive-event transitions
needs ONE remembered row per user — the last event seen — which no
windowed aggregation can express across micro-batch boundaries, so the
stream carries (last_tsn, last_type) in GroupState and the batch path
runs the IDENTICAL pandas kernel per user over the full timeline.
s28's oracle certifies the batch grouped-map against the pure-SQL lag
window, which proves the Arrow crossing; the stream test then proves
GroupState stitches batch boundaries seamlessly (a user's pair that
STRADDLES two files must still be emitted, exactly once).

Emitted rows are (user_id, day, a, b) with day the event-time day of
the LATER event — aggregating to (day, a, b) counts gives the
time-resolved transition matrix, i.e. grammar DRIFT over time, where
g18's corpus-total matrix is its marginal.

Ordering contract (every ordered-state operator's): within a key,
events must arrive in event-time order across batches (each batch is
sorted internally; the test feeds files in order; production fronts
this with a watermarked sort). State: one (long, string) per user —
bounded, corpus-size-independent; idle keys can be aged out with a
ProcessingTimeTimeout in a long-running deployment.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

NANOS_PER_DAY = 86_400_000_000_000

OUT_SCHEMA = "user_id long, day long, a string, b string"
STATE_SCHEMA = "last_tsn long, last_type string"


def _pairs_from_frame(
    pdf: pd.DataFrame, prev_type: str | None
) -> tuple[pd.DataFrame, int | None, str | None]:
    """The shared kernel: sort one user's rows by (tsn, event_id),
    pair each with its predecessor (seeded by ``prev_type`` carried
    in from earlier batches), and return (pairs, last_tsn,
    last_type). Exactly one emission per consecutive pair."""
    rows = pdf.sort_values(["tsn", "event_id"])
    days, a_out, b_out = [], [], []
    prev = prev_type
    for tsn, tp in zip(rows["tsn"], rows["event_type"]):
        if prev is not None:
            days.append(int(tsn) // NANOS_PER_DAY)
            a_out.append(prev)
            b_out.append(tp)
        prev = tp
    if len(rows):
        last_tsn = int(rows["tsn"].iloc[-1])
        last_type = str(rows["event_type"].iloc[-1])
    else:  # pragma: no cover - Spark never calls with 0 rows
        last_tsn, last_type = None, prev_type
    return (
        pd.DataFrame({"day": days, "a": a_out, "b": b_out}),
        last_tsn,
        last_type,
    )


def batch_transitions(
    ev: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Batch grouped-map over full timelines — the certified side
    (s28's oracle checks it against the pure-SQL lag window).
    Expects columns (user_col, tsn, event_id, type_col); returns
    (user_id, day, a, b) one row per consecutive pair."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pairs, _, _ = _pairs_from_frame(
            pdf.rename(columns={type_col: "event_type"}), None
        )
        pairs.insert(0, "user_id", pdf[user_col].iloc[0])
        return pairs

    return ev.groupBy(user_col).applyInPandas(run, OUT_SCHEMA)


def _update_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    prev_tsn, prev_type = (
        state.get if state.exists else (None, None)
    )
    rows = pd.concat(list(pdfs))
    pairs, last_tsn, last_type = _pairs_from_frame(rows, prev_type)
    if last_tsn is not None:
        state.update((last_tsn, last_type))
    pairs.insert(0, "user_id", key[0])
    yield pairs


def stateful_transitions(events: DataFrame) -> DataFrame:
    """Streaming twin: the same kernel with (last_tsn, last_type)
    carried in GroupState, so pairs straddling micro-batches emit
    exactly once. Append mode — each emitted row is final."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
