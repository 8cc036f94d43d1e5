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

from ..quantum import VALUE_MICRO


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


# ---- value-weighted daily folds (VERDICT r13 ask #4) -------------------
#
# The state row's second integer is the hour's exact micro value sum
# (sum of floor(value * VALUE_MICRO) per event — streaming/autocorr.py),
# so every DAILY value statistic is determined exactly too: a day's
# micro sum is the integer sum of its 24 hour cells (the same
# trunc-div-composes argument as the count fold above).
#
# The monitors then run on WHOLE-unit daily values, v = micro_day_sum
# div VALUE_MICRO: the daily monitors square their series (Granger's
# s11/syy, ANOVA's q, Hurst's block s*s), and micro-scale daily sums
# (~1.5e8 at sf0.1) would put sum-of-squares at ~1.5e19 — past int64.
# Whole units (~1.5e4/day) keep every sufficient statistic below ~1e12
# with 1e6 headroom, and the truncation is an exact, deterministic
# derivation from the state (one trunc div of a non-negative integer —
# identical on both engines for the fixtures' value >= 0; the batch
# queries and oracles apply the IDENTICAL div-after-sum, so streamed ==
# batch == oracle by construction).


def daily_values_by_type(state_rows: DataFrame) -> DataFrame:
    """(event_type, hr, s) state rows -> (d, event_type, c) whole-unit
    daily value sums (c = day micro sum div VALUE_MICRO); exact integer
    derivation — the value-weighted sibling of daily_counts_by_type."""
    return (state_rows
            .select("event_type", F.expr("hr div 24").alias("d"), "s")
            .groupBy("d", "event_type")
            .agg(F.expr(f"sum(s) div {VALUE_MICRO}").alias("c")))


def daily_values_global(state_rows: DataFrame) -> DataFrame:
    """(event_type, hr, s) state rows -> global (d, c) whole-unit daily
    value sums across all types; exact integer derivation."""
    return (state_rows
            .select(F.expr("hr div 24").alias("d"), "s")
            .groupBy("d")
            .agg(F.expr(f"sum(s) div {VALUE_MICRO}").alias("c")))
