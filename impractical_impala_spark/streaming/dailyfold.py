"""Daily-count folds over the shared hourly-count state.

The single hourly-count stateful operator
(``streaming/autocorr.py::streaming_autocorr24_state`` — one long per
(event_type, hour-index), calendar-bounded) also determines every
DAILY-count statistic exactly: a day's count is the integer sum of its
24 hour cells (``hr div 24``; DAY_NS == 24 * HOUR_NS and event
timestamps are non-negative, so the floor divisions nest exactly).
These two folds feed the daily-monitor finalizers (transfer entropy,
Granger, day-of-week ANOVA, Hurst) from the same accumulated state the
hourly monitors read — one state operator, one shuffle, every
time-series monitor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_counts_by_type(state_rows: DataFrame) -> DataFrame:
    """(event_type, hr, c) state rows -> (d, event_type, c) daily
    counts; exact integer sums."""
    return (state_rows
            .select("event_type", F.expr("hr div 24").alias("d"), "c")
            .groupBy("d", "event_type")
            .agg(F.sum("c").alias("c")))


def daily_counts_global(state_rows: DataFrame) -> DataFrame:
    """(event_type, hr, c) state rows -> global (d, c) daily counts;
    exact integer sums across all types."""
    return (state_rows
            .select(F.expr("hr div 24").alias("d"), "c")
            .groupBy("d")
            .agg(F.sum("c").alias("c")))
