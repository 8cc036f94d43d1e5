"""Streaming dense-spine LOCF gap-fill — the incremental twin of
``queries/analytics.py::events_gapfill_locf``.

SIXTEENTH finalizer over the SHARED hourly stateful operator
(``streaming/autocorr.py``) and the FIRST value-weighted one (VERDICT
r12 ask #4): the state row now carries the micro-quantized value sum
``s`` (sum of floor(value * 10000) per event) alongside the count, and
``finalize`` feeds the accumulated (type, hr, cnt, s) frame through
the IDENTICAL shared arithmetic as the batch query
(``queries.analytics.gapfill_from_hourly`` — dense per-type hour
spine, LOCF window over the integer sums, one final division), so the
streamed fill is bit-equal to the batch one over any chunking of the
input: integer addition is associative where a float running sum is
arrival-order-dependent.

Scale shape: state shuffles once on (event_type, hr); finalize is
spine-cardinality window work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.analytics import gapfill_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_gapfill_state", "latest_state", "finalize"]


def streaming_gapfill_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type, ts_ns and value (the load_table
    form). Identical state operator to the other hourly twins — only
    the finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_gapfill_locf, fed from the
    accumulated (type, hr) counts and micro value sums instead of the
    fact table."""
    hourly = state_rows.select("event_type", "hr",
                               F.col("c").alias("cnt"),
                               F.col("s").alias("s"))
    return gapfill_from_hourly(hourly)
