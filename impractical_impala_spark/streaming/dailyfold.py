"""Daily-count folds over the shared hourly-count state.

The single hourly-count stateful operator
(``streaming/autocorr.py::streaming_autocorr24_state`` — one long per
(event_type, hour-index), calendar-bounded) also determines every
DAILY-count statistic exactly: a day's count is the integer sum of its
24 hour cells.

Sign-safety (ADVICE r12): the fold is ``hr div 24`` where
``hr = ts_ns div HOUR_NS`` and the batch spine is
``ts_ns div DAY_NS`` — ALL Spark ``div``, truncation toward zero —
and truncating division COMPOSES for positive divisors whatever the
sign of x: for x >= 0 it is floor division (which nests); for x < 0,
``trunc(trunc(x/a)/b) = -floor(floor(-x/a)/b) = -floor(-x/(a*b)) =
trunc(x/(a*b))``. So a negative pre-epoch ``ts_ns`` lands on the SAME
day cell as the batch query with no assumption needed — switching this
fold to floor semantics would have INTRODUCED the negative-ts mismatch
the advice worried about. (The DuckDB oracles' ``//`` is floor
division and would differ from both on negative ts; the fixtures'
timestamps are non-negative, and that is a batch-vs-oracle convention
independent of this fold. Pinned by
``tests/test_streaming_daily_finalizers.py::
test_daily_fold_truncation_composes_for_negative_hours``.)
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
