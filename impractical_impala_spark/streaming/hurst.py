"""Streaming Hurst-exponent monitor — the incremental twin of
``queries/spectral_info.py::events_hurst_exponent``.

THIRTEENTH finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py``), daily family: the accumulated (type, hr)
counts fold onto the GLOBAL day spine (``hr div 24`` summed across all
types, exact integer sums — ``streaming/dailyfold.py``) and run
through the IDENTICAL shared arithmetic as the batch query
(``queries.spectral_info.hurst_from_daily`` — aggregated-variance
block means, micro-quantized ln-variances, 4-point OLS slope), so the
streamed long-memory estimate is bit-equal to the batch one over any
chunking.

Scale shape: state shuffles once on (event_type, hr); finalize is
day-spine cardinality work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..queries.spectral_info import hurst_from_daily
from .autocorr import latest_state, streaming_autocorr24_state
from .dailyfold import daily_counts_global

__all__ = ["streaming_hurst_state", "latest_state", "finalize"]


def streaming_hurst_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the hourly twins — only the finalizer
    differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_hurst_exponent, fed from the
    accumulated state folded onto the global day spine."""
    return hurst_from_daily(daily_counts_global(state_rows))
