"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windows (streaming/sessions.py) cover time-bucketed state;
this is the escape hatch for state machines Spark has no builtin for.
Demo operator: per-user running EWMA + event count, state carried
across micro-batches. State is a fixed-width tuple per key, so the
state store stays O(#users) regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_ALPHA = 0.1

STATE_SCHEMA = "count LONG, ewma DOUBLE"
OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("ewma_value", T.DoubleType()),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    count, ewma = state.get if state.exists else (0, None)
    for pdf in pdfs:
        pdf = pdf.sort_values("event_id")
        for v in pdf["value"]:
            ewma = v if ewma is None else EWMA_ALPHA * v + (1 - EWMA_ALPHA) * ewma
            count += 1
    state.update((count, ewma))
    yield pd.DataFrame({
        "user_id": [user_id], "n_events": [count], "ewma_value": [ewma],
    })


def user_ewma(events: DataFrame) -> DataFrame:
    """Streaming per-user EWMA: one state row per user, one output row
    per (user, micro-batch)."""
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# The batch reference implementation lives in tests/streaming_refs.py
# (product source carries no toPandas() materializations).
