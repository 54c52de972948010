"""Custom stateful streaming operator via applyInPandasWithState.

Running cumulative event-weight per user across micro-batches — the kind
of operator built-in windowed aggregation can't express (unbounded
cumulative state with custom update logic), per the build brief's
`applyInPandasWithState` surface. State is one row per user (bounded by
the user population); batches arrive as Arrow-backed pandas frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from ..operators.weights import EVENT_WEIGHTS_DRIVER

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("total_weight", DoubleType()),
    StructField("n_events", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("total_weight", DoubleType()),
    StructField("n_events", LongType()),
])


def _update_user(key, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        w = pdf["event_type"].map(EVENT_WEIGHTS_DRIVER).fillna(0.0)
        total += float(w.sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame({"user_id": [key[0]], "total_weight": [total],
                        "n_events": [n]})


def cumulative_user_weights(events: DataFrame) -> DataFrame:
    """Streaming DataFrame in (user_id, event_type, ...) → per-batch
    emission of each updated user's lifetime weighted-interaction total."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming twin of operators/relational_ext.event_transitions: the lag()
# window needs each user's PREVIOUS event — across micro-batch boundaries
# that is exactly one row of state per user (last event type at the
# highest (ts, event_id) seen), so the batch window op streams as an
# applyInPandasWithState with O(|users|) state.
# ---------------------------------------------------------------------------

TRANSITION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("prev_type", StringType()),
    StructField("next_type", StringType()),
])

_LAST_EVENT_STATE = StructType([
    StructField("last_type", StringType()),
])


def _emit_transitions(key, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        types = pdf["event_type"].tolist()
        prevs = [last] + types[:-1]
        mask = [p is not None for p in prevs]
        if any(mask):
            yield pd.DataFrame({
                "user_id": [key[0]] * sum(mask),
                "prev_type": [p for p, m in zip(prevs, mask) if m],
                "next_type": [t for t, m in zip(types, mask) if m],
            })
        if types:
            last = types[-1]
    if last is not None:
        state.update((last,))


def transition_pairs_stream(events: DataFrame) -> DataFrame:
    """Streaming (user_id, prev_type, next_type) transition rows — one
    emission per consecutive same-user event pair, boundaries included
    because the last event of each batch persists as per-user state.
    Aggregating the emitted rows by (prev_type, next_type) reproduces the
    batch `event_transitions` counts exactly (test-pinned); the emitted
    stream is itself the input a downstream streaming aggregation or CMS
    sketch would consume. Requires per-user event-time-ordered arrival
    (the synthetic feed's event_id order), the same contract as the
    sessionization twin."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _emit_transitions,
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=_LAST_EVENT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
