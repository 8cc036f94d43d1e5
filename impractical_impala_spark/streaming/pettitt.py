"""Streaming Pettitt rank change-point monitor — the incremental twin
of ``queries/stat_tests.py::events_pettitt_test``.

FOURTEENTH finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py``), daily family: the accumulated (type, hr)
counts fold onto the day spine (``hr div 24``, exact integer sums —
``streaming/dailyfold.py``) and run through the IDENTICAL shared
arithmetic as the batch query (``queries.stat_tests.
pettitt_from_daily`` — doubled-midrank U_t identity off the
zero-filled day spine, earliest-day K argmax, micro-quantized
p-approximation), so the streamed change-point panel is bit-equal to
the batch one over any chunking.

Scale shape: state shuffles once on (event_type, hr); finalize is
day-spine cardinality work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.stat_tests import pettitt_from_daily
from .autocorr import latest_state, streaming_autocorr24_state
from .dailyfold import daily_counts_by_type

__all__ = ["streaming_pettitt_state", "latest_state", "finalize"]


def streaming_pettitt_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the hourly twins — only the finalizer
    differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_pettitt_test, fed from the
    accumulated state folded onto the day spine."""
    daily = daily_counts_by_type(state_rows).select(
        "event_type", "d", F.col("c").alias("c"))
    return pettitt_from_daily(daily)
