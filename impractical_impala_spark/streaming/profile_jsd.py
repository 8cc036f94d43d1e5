"""Streaming hourly-rhythm JSD monitor — the incremental twin of
``queries/dynamics.py::events_hourly_profile_jsd``.

Third finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py`` — ONE integer of state per (event_type,
hour-index); calendar-bounded, the p-chart/SAX class): autocorr, CUSUM
and now the pairwise-rhythm matrix are different reductions over the
same accumulated sparse hourly table, which is exactly how a
production monitor fleet should share state. ``finalize`` folds the
absolute-hour counts onto the 24-bin hour-of-day spine (``hr % 24`` —
exact integer sums) and feeds them through the IDENTICAL shared
arithmetic as the batch query (``queries.dynamics.
profile_jsd_from_hourly`` — fixed 24-cell pair join, term-wise zero
handling, nano quantization before the per-pair sum), so the streamed
divergence matrix is bit-equal to the batch one over any chunking of
the input.

Scale shape: state shuffles once on (event_type, hr) — a uniform
composite key with one long per key; finalize collapses to types x 24
cells then a (types^2 x 24)-bounded pair join, independent of event
volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.dynamics import profile_jsd_from_hourly
from .autocorr import latest_state, streaming_autocorr24_state

__all__ = ["streaming_profile_jsd_state", "latest_state", "finalize"]


def streaming_profile_jsd_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the autocorr/CUSUM twins — per
    (type, hour) running counts; only the finalizer differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_hourly_profile_jsd, fed from the
    accumulated (type, hr) counts instead of the fact table: fold the
    absolute hour index onto the hour-of-day spine (exact integer
    sums), then the shared pair-join reduction."""
    cen = (state_rows
           .select("event_type", (F.col("hr") % 24).alias("h"),
                   F.col("c").alias("c"))
           .groupBy("event_type", "h")
           .agg(F.sum("c").alias("c")))
    return profile_jsd_from_hourly(cen)
