"""Streaming hour → day → week rollup — the incremental twin of
``queries/warehouse_extras.py::events_time_rollup``.

SEVENTEENTH finalizer over the SHARED hourly stateful operator
(``streaming/autocorr.py``), value-weighted like the gap-fill twin,
and the WEEKLY-rollup extension of the daily fold (VERDICT r12 ask
#6): the accumulated (type, hr) counts and micro value sums cascade
``hr div 24`` onto the day spine and ``d div 7`` onto the week spine
with exact integer sums — the ``streaming/dailyfold.py``
trunc-div-composition argument applied one level up — through the
IDENTICAL shared arithmetic as the batch query
(``queries.warehouse_extras.time_rollup_from_hourly``), so every
grain's streamed row is bit-equal to batch over any chunking.

Scale shape: state shuffles once on (event_type, hr); finalize is
spine-cardinality aggregation work (hours, then days, then weeks),
independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.warehouse_extras import time_rollup_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_time_rollup_state", "latest_state", "finalize"]


def streaming_time_rollup_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type, ts_ns and value (the load_table
    form). Identical state operator to the other hourly twins — only
    the finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_time_rollup, fed from the
    accumulated (type, hr) counts and micro value sums instead of the
    fact table."""
    hour = state_rows.select("event_type", "hr",
                             F.col("s").alias("s"),
                             F.col("c").alias("n"))
    return time_rollup_from_hourly(hour)
