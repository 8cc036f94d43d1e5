"""Streaming peak/p95 load-headroom monitor — the incremental twin of
``queries/dynamics.py::events_peak_load_ratio``.

FOURTH finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py`` — ONE integer of state per (event_type,
hour-index); calendar-bounded): autocorr, CUSUM, rhythm JSD and now
the capacity-headroom panel are different reductions over the same
accumulated sparse hourly table. ``finalize`` feeds the (type, hr)
counts straight through the IDENTICAL shared arithmetic as the batch
query (``queries.dynamics.peak_load_from_hourly`` — load census,
closed-form zero row for silent hours, first-crossing p95, exact
integer ppm ratios), so the streamed panel is bit-equal to the batch
one over any chunking of the input.

Scale shape: state shuffles once on (event_type, hr); finalize is
census-cardinality work (types x distinct load levels), independent of
event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.dynamics import peak_load_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_peak_load_state", "latest_state", "finalize"]


def streaming_peak_load_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the autocorr/CUSUM/JSD twins — per
    (type, hour) running counts; only the finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_peak_load_ratio, fed from the
    accumulated (type, hr) counts instead of the fact table."""
    cnt = state_rows.select("event_type", F.col("hr").alias("t"),
                            F.col("c").alias("c"))
    return peak_load_from_hourly(cnt)
