"""Streaming Kleinberg burst-detection monitor — the incremental twin
of ``queries/monitor_eval.py::events_burst_viterbi``.

NINTH finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py`` — ONE integer of state per (event_type,
hour-index); calendar-bounded): ``finalize`` feeds the accumulated
(type, hr) counts through the IDENTICAL shared arithmetic as the batch
query (``queries.monitor_eval.burst_viterbi_from_hourly`` — dense
per-type spine, exact integer micro-nat Viterbi cost recursion in an
Arrow kernel over the calendar-bounded series), so the streamed burst
trellis is bit-equal to the batch one over any chunking of the input.

Scale shape: state shuffles once on (event_type, hr); finalize is one
Arrow batch per type over the calendar-bounded series, independent of
event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.monitor_eval import burst_viterbi_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_burst_state", "latest_state", "finalize"]


def streaming_burst_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the other hourly-count twins — only
    the finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_burst_viterbi, fed from the
    accumulated (type, hr) counts instead of the fact table."""
    hourly = state_rows.select("event_type", "hr",
                               F.col("c").alias("cnt"))
    return burst_viterbi_from_hourly(hourly)
