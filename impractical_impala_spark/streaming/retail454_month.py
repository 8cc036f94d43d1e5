"""Streaming 4-5-4 retail fiscal-MONTH rollup — the incremental twin
of ``queries/warehouse_extras.py::events_retail454_months`` (the
4/5/4-week merchandising grain below the r15 fiscal quarters).

The 28th finalizer over the SHARED hourly stateful operator
(``streaming/autocorr.py``): the accumulated (type, hr) counts + micro
value sums fold hr → day with exact integer sums (the dailyfold
trunc-composition argument), then day → 4-5-4 fiscal month through
real Gregorian date arithmetic inside the IDENTICAL shared helper as
the batch query (``retail454_months_from_hourly``), so the streamed
fiscal months are bit-equal to batch over any chunking of the input.

Scale shape: state shuffles once on (event_type, hr); finalize is
calendar-cardinality work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.warehouse_extras import retail454_months_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_retail454_month_state", "latest_state", "finalize"]


def streaming_retail454_month_state(ev: DataFrame) -> DataFrame:
    """Identical state operator to every other twin — only the
    finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_retail454_months, fed from the
    accumulated (type, hr) state rows (c -> n, s carries the micro
    value sum — the retail454 quarter twin's contract one grain
    down)."""
    hour = state_rows.select("event_type", "hr",
                             F.col("s").alias("s"),
                             F.col("c").alias("n"))
    return retail454_months_from_hourly(hour)
