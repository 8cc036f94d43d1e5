"""Streaming calendar-quarter rollup — the incremental twin of
``queries/warehouse_extras.py::events_quarterly_rollup`` (VERDICT r13
ask #6, the fiscal grain past the monthly twin).

Another finalizer over the SHARED hourly stateful operator
(``streaming/autocorr.py``): the accumulated (type, hr) counts + micro
value sums fold hr → day with exact integer sums (the dailyfold
trunc-composition argument), then day → quarter through real Gregorian
date arithmetic inside the IDENTICAL shared helper as the batch query
(``quarterly_rollup_from_hourly``), so the streamed quarters are
bit-equal to batch over any chunking of the input.

Scale shape: state shuffles once on (event_type, hr); finalize is
calendar-cardinality work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.warehouse_extras import quarterly_rollup_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_quarterly_state", "latest_state", "finalize"]


def streaming_quarterly_state(ev: DataFrame) -> DataFrame:
    """Identical state operator to every other twin — only the
    finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_quarterly_rollup, fed from the
    accumulated (type, hr) state rows (c -> n, s carries the micro
    value sum — the monthly twin's contract one grain up)."""
    hour = state_rows.select("event_type", "hr",
                             F.col("s").alias("s"),
                             F.col("c").alias("n"))
    return quarterly_rollup_from_hourly(hour)
