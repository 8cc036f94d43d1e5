"""Streaming calendar-month rollup — the incremental twin of
``queries/warehouse_extras.py::events_monthly_rollup``.

EIGHTEENTH finalizer over the SHARED hourly stateful operator
(``streaming/autocorr.py``), value-weighted like the gap-fill and
time-rollup twins, and the CALENDAR extension of the dailyfold
argument: the accumulated (type, hr) counts and micro value sums fold
``hr div 24`` onto the day spine (truncating div composes — the
dailyfold proof) and then map each day index through real Gregorian
date arithmetic onto its month — a grain no fixed divisor expresses.
``finalize`` feeds the state through the IDENTICAL shared arithmetic
as the batch query (``queries.warehouse_extras.
monthly_rollup_from_hourly``), so every month row is bit-equal to
batch over any chunking of the input: integer sums are associative,
and the day→month map is a pure function of the day index.

Scale shape: state shuffles once on (event_type, hr); finalize is
spine-cardinality work (hours → days → months), independent of event
volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.warehouse_extras import monthly_rollup_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_monthly_rollup_state", "latest_state", "finalize"]


def streaming_monthly_rollup_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type, ts_ns and value (the load_table
    form). Identical state operator to the other hourly twins — only
    the finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_monthly_rollup, fed from the
    accumulated (type, hr) counts and micro value sums instead of the
    fact table."""
    hour = state_rows.select("event_type", "hr",
                             F.col("s").alias("s"),
                             F.col("c").alias("n"))
    return monthly_rollup_from_hourly(hour)
