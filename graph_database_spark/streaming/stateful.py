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
    DoubleType, LongType, StructField, StructType,
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
