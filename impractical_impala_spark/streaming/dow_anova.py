"""Streaming day-of-week ANOVA monitor — the incremental twin of
``queries/hypothesis.py::events_dow_anova``.

TWELFTH finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py``), daily family: the accumulated (type, hr)
counts fold onto the day spine (``hr div 24``, exact integer sums —
``streaming/dailyfold.py``) and run through the IDENTICAL shared
arithmetic as the batch query (``queries.hypothesis.
dow_anova_from_daily`` — zero-filled weekday groups, milli-quantized
order-free group terms, micro-quantized F vs the fixed df1=6
critical value), so the streamed weekday-effect panel is bit-equal to
the batch one over any chunking.

Scale shape: state shuffles once on (event_type, hr); finalize is
day-spine cardinality work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.hypothesis import dow_anova_from_daily
from .autocorr import latest_state, streaming_autocorr24_state
from .dailyfold import daily_counts_by_type

__all__ = ["streaming_dow_anova_state", "latest_state", "finalize"]


def streaming_dow_anova_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the hourly twins — only the finalizer
    differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_dow_anova, fed from the
    accumulated state folded onto the day spine (the helper takes
    (event_type, d, c) column order)."""
    daily = daily_counts_by_type(state_rows).select(
        "event_type", "d", F.col("c").alias("c"))
    return dow_anova_from_daily(daily)
