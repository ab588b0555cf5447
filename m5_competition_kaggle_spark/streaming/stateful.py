"""Custom stateful streaming operator via ``applyInPandasWithState``.

The streaming twin of ``operators/stateful.py``: a per-key accumulator
(running count / sum / EWMA) carried across micro-batches in GroupState.
This is the pattern for any custom online aggregate Spark lacks natively —
the state schema is explicit, the update function sees each key's new rows
per micro-batch, and watermark-based timeouts bound state at scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total double, ewma double"
STATE_SCHEMA = "n long, total double, ewma double"


def _update_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, ewma = state.get if state.exists else (0, 0.0, None)
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"])
    for v in rows["value"]:
        n += 1
        total += float(v)
        ewma = float(v) if ewma is None else ewma * 0.5 + float(v) * 0.5
    state.update((n, total, ewma))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total": [total],
            "ewma": [ewma],
        }
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals + EWMA with explicit streaming state.
    Works on a streaming DataFrame; emits the refreshed accumulator for
    every user seen in each micro-batch (Update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
