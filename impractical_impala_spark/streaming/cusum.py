"""Streaming CUSUM change-point monitor — the incremental twin of
``queries/drift.py::events_cusum_changepoint`` (driver hash-green since
round 6).

Shares the hourly-count stateful operator with the lag-24 autocorr
twin (``streaming/autocorr.py`` — ONE integer of state per
(event_type, hour-index); calendar-bounded, the p-chart/SAX class):
the two monitors are different FINALIZERS over the same accumulated
sparse hourly table, which is exactly how a production monitor fleet
should share state. ``finalize`` feeds the counts through the
IDENTICAL shared arithmetic as the batch query
(``queries.drift.cusum_frame`` — dense spine, integer n-scaled
|n*cum_t − t*total| scan, earliest-argmax tie-break), so the streamed
change-point is bit-equal to the batch one over any chunking.

Scale shape: state shuffles once on (event_type, hr) — a uniform
composite key with one long per key; finalize is spine-cardinality
work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.drift import cusum_frame
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_cusum_state", "latest_state", "finalize"]


def streaming_cusum_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the autocorr twin — per (type, hour)
    running counts; only the finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_cusum_changepoint, fed from the
    accumulated (type, hr) counts instead of the fact table."""
    hourly = state_rows.select("event_type", "hr",
                               F.col("c").alias("cnt"))
    return cusum_frame(hourly)
