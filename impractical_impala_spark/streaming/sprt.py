"""Streaming Wald-SPRT experiment monitor — the incremental twin of
``queries/monitor_eval.py::events_sprt_sequential``.

FIFTEENTH finalizer over the SHARED hourly-count stateful operator
(``streaming/autocorr.py``), daily family: the accumulated (type, hr)
counts fold onto the day spine (``hr div 24``, exact integer sums —
``streaming/dailyfold.py``) and run through the IDENTICAL shared
arithmetic as the batch query (``queries.monitor_eval.
sprt_from_daily`` — micro-nat integer log-likelihood-ratio walk with
pre-quantized per-word constants, Wald boundary flags, sequential
decision state), so the streamed walk is bit-equal to the batch one
over any chunking. This is the natural streaming deployment of SPRT —
the sequential test was designed to be folded as data arrives.

Scale shape: state shuffles once on (event_type, hr); finalize is
day-spine cardinality work, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.monitor_eval import sprt_from_per_day
from .autocorr import latest_state, streaming_autocorr24_state
from .dailyfold import daily_counts_by_type

__all__ = ["streaming_sprt_state", "latest_state", "finalize"]


def streaming_sprt_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form).
    Identical state operator to the hourly twins — only the finalizer
    differs."""
    return streaming_autocorr24_state(ev)


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_sprt_sequential, fed from the
    accumulated state folded onto the day spine: per-day successes x
    (purchases) and trials n (purchases + clicks) are exact integer
    sums of the hourly counts, identical to the batch census."""
    per_day = (daily_counts_by_type(state_rows)
               .filter(F.col("event_type").isin("purchase", "click"))
               .groupBy("d")
               .agg(F.sum(F.expr(
                   "case when event_type = 'purchase' then c"
                   " else 0L end")).alias("x"),
                    F.sum("c").alias("n")))
    return sprt_from_per_day(per_day)
