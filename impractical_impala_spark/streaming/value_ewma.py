"""Streaming value-weighted EWMA — the incremental twin of
``queries/drift.py::events_value_ewma_hourly``.

NINETEENTH finalizer over the SHARED hourly stateful operator
(``streaming/autocorr.py``) and the third value-weighted one: the
state row's micro-quantized value sum ``s`` (sum of floor(value *
10000) per event, exact associative integer addition) feeds the
IDENTICAL 16-term power-of-two lag polynomial as the batch query
(``queries.drift.value_ewma_from_hourly`` — dense per-type hour spine,
integer scaled/norm, one truncating division), so the streamed
smoothed-throughput series is bit-equal to the batch one over any
chunking of the input.

Scale shape: state shuffles once on (event_type, hr); finalize is
spine-cardinality window work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.drift import value_ewma_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_value_ewma_state", "latest_state", "finalize"]


def streaming_value_ewma_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type, ts_ns and value (the load_table
    form). Identical state operator to the other hourly twins — only
    the finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_value_ewma_hourly, fed from the
    accumulated (type, hr) micro value sums instead of the fact
    table."""
    hourly = state_rows.select("event_type", "hr",
                               F.col("s").alias("s"))
    return value_ewma_from_hourly(hourly)
