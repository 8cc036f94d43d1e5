"""Streaming first-touch: daily new-user counts over an event stream —
the streaming twin of ``queries/analytics.py::events_cumulative_users``
(same first-touch decomposition; the batch form carries the running
total, the stream emits per-day finalized counts as the watermark
closes each day).

Scale/state story: ``dropDuplicatesWithinWatermark(["user_id"])`` keeps
the FIRST arrival per user and expires the key once the watermark
passes its horizon, so state is bounded by (active users within the
horizon), not stream lifetime. The horizon is therefore not a tuning
knob but the metric's definition: with a 90-day horizon a user
reappearing after 90 quiet days counts as new again — exactly the
"new or resurrected" semantics growth dashboards use. An unbounded
``dropDuplicates`` on user_id would be the state-leak anti-pattern
(every user ever seen, forever). The convergence test uses a horizon
longer than the fixture's 30-day span, where streaming first-touch
equals the batch first-touch exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_touch_daily(events: DataFrame,
                      watermark: str = "35 days") -> DataFrame:
    """Per-day count of users seen for the first time within the
    watermark horizon. Append-mode safe: the day window finalizes once
    the watermark passes its end."""
    firsts = (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id"])
    )
    return (
        firsts.groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.count(F.lit(1)).alias("new_users"))
        .select(F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
                "new_users")
    )
