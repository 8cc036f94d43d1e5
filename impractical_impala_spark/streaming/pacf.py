"""Streaming PACF (Durbin-Levinson, lags 1-3) monitor — the
incremental twin of ``queries/linkage_splits.py::events_pacf``.

EIGHTH finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py`` — ONE integer of state per (event_type,
hour-index); calendar-bounded): ``finalize`` feeds the accumulated
(type, hr) counts through the IDENTICAL shared arithmetic as the
batch query (``queries.linkage_splits.pacf_from_hourly`` — dense
per-type spine, n²-scaled exact-integer ACF sufficient statistics,
quantize-then-recurse Durbin-Levinson), so the streamed AR-order
panel is bit-equal to the batch one over any chunking of the input.

Scale shape: state shuffles once on (event_type, hr); finalize is
spine-cardinality window work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.linkage_splits import pacf_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_pacf_state", "latest_state", "finalize"]


def streaming_pacf_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the other hourly-count twins — only
    the finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_pacf, fed from the accumulated
    (type, hr) counts instead of the fact table."""
    hourly = state_rows.select("event_type", "hr",
                               F.col("c").alias("cnt"))
    return pacf_from_hourly(hourly)
