"""Streaming Granger-causality monitor — the incremental twin of
``queries/spectral_info.py::events_granger_causality``.

ELEVENTH finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py``), daily family: the accumulated (type, hr)
counts fold onto the day spine (``hr div 24``, exact integer sums —
``streaming/dailyfold.py``) and run through the IDENTICAL shared
arithmetic as the batch query (``queries.spectral_info.
granger_from_daily`` — closed-form integer normal equations over the
zero-filled day spine, micro-quantized F), so the streamed causality
panel is bit-equal to the batch one over any chunking.

Scale shape: state shuffles once on (event_type, hr); finalize is
day-spine cardinality work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..queries.spectral_info import granger_from_daily
from .autocorr import latest_state, streaming_autocorr24_state
from .dailyfold import daily_counts_by_type

__all__ = ["streaming_granger_state", "latest_state", "finalize"]


def streaming_granger_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the hourly twins — only the finalizer
    differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_granger_causality, fed from the
    accumulated state folded onto the day spine."""
    return granger_from_daily(daily_counts_by_type(state_rows))
