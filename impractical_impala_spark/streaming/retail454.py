"""Streaming 4-5-4 retail fiscal-quarter rollup — the incremental twin
of ``queries/warehouse_extras.py::events_retail454_rollup`` (VERDICT
r14 ask #6, the offset-fiscal grain past calendar quarters).

The 27th finalizer over the SHARED hourly stateful operator
(``streaming/autocorr.py``): the accumulated (type, hr) counts + micro
value sums fold hr → day with exact integer sums (the dailyfold
trunc-composition argument), then day → 4-5-4 fiscal quarter through
real Gregorian date arithmetic inside the IDENTICAL shared helper as
the batch query (``retail454_rollup_from_hourly``), so the streamed
fiscal quarters are bit-equal to batch over any chunking of the input.

Scale shape: state shuffles once on (event_type, hr); finalize is
calendar-cardinality work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.warehouse_extras import retail454_rollup_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_retail454_state", "latest_state", "finalize"]


def streaming_retail454_state(ev: DataFrame) -> DataFrame:
    """Identical state operator to every other twin — only the
    finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_retail454_rollup, fed from the
    accumulated (type, hr) state rows (c -> n, s carries the micro
    value sum — the quarterly twin's contract on the 4-5-4 calendar)."""
    hour = state_rows.select("event_type", "hr",
                             F.col("s").alias("s"),
                             F.col("c").alias("n"))
    return retail454_rollup_from_hourly(hour)
