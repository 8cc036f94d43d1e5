"""Streaming Fano-factor (burstiness) monitor — the incremental twin
of ``queries/drift.py::events_fano_burstiness``.

FIFTH finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py`` — ONE integer of state per (event_type,
hour-index); calendar-bounded): autocorr, CUSUM, rhythm JSD, peak-load
and now the index of dispersion are different reductions over the same
accumulated sparse hourly table. ``finalize`` feeds the (type, hr)
counts through the IDENTICAL shared arithmetic as the batch query
(``queries.drift.fano_from_hourly`` — dense per-type spine with real
zeros for silent hours, three integer sufficient statistics, one
fixed-point division), so the streamed Fano factor is bit-equal to the
batch one over any chunking of the input.

Scale shape: state shuffles once on (event_type, hr); finalize is
spine-cardinality work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.drift import fano_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_fano_state", "latest_state", "finalize"]


def streaming_fano_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the other hourly-count twins — only
    the finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_fano_burstiness, fed from the
    accumulated (type, hr) counts instead of the fact table."""
    hourly = state_rows.select("event_type", "hr",
                               F.col("c").alias("cnt"))
    return fano_from_hourly(hourly)
