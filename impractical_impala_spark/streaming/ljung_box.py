"""Streaming Ljung-Box white-noise monitor — the incremental twin of
``queries/hypothesis.py::events_ljung_box``.

TWENTY-NINTH finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py``), daily family: the accumulated (type, hr)
counts fold onto the day spine (``hr div 24``, exact integer sums —
``streaming/dailyfold.py``) and run through the IDENTICAL shared
arithmetic as the batch query (``queries.hypothesis.
ljung_box_from_daily`` — zero-filled series, n^2-scaled exact-integer
autocorrelations, fixed-order Q fold, micro quantization vs the
chi2(LB_LAGS) critical value), so the streamed white-noise panel is
bit-equal to the batch one over any chunking.

Scale shape: state shuffles once on (event_type, hr); finalize is
day-spine cardinality work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.hypothesis import ljung_box_from_daily
from .autocorr import latest_state, streaming_autocorr24_state
from .dailyfold import daily_counts_by_type

__all__ = ["streaming_ljung_box_state", "latest_state", "finalize"]


def streaming_ljung_box_state(ev: DataFrame) -> DataFrame:
    """Identical state operator to the hourly twins — only the
    finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_ljung_box, fed from the
    accumulated state folded onto the day spine."""
    daily = daily_counts_by_type(state_rows).select(
        "event_type", "d", F.col("c").alias("c"))
    return ljung_box_from_daily(daily)
