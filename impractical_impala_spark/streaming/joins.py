"""Stream-stream joins — the remaining Structured Streaming operator
class after windowed/stateful aggregation (streaming/sessions.py,
stateful.py): two watermarked streams joined on key + time-bound
condition, state bounded by the join window.

Operator: click->purchase attribution. A purchase joins every click by
the same user in the preceding hour. Both sides carry event-time
watermarks, so the state store evicts clicks once the watermark passes
their join horizon (click_ts + 1 hour) — state is O(events per hour),
not O(stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_WINDOW = "1 hour"
WATERMARK = "2 hours"


def split_clicks_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split one event stream into watermarked click/purchase streams
    (stream-stream SELF joins need distinct watermarked branches)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", WATERMARK)
    )
    return clicks, purchases


def click_purchase_join(events: DataFrame) -> DataFrame:
    """Inner stream-stream join: purchases matched to same-user clicks
    within the preceding JOIN_WINDOW. The time bound is what lets the
    engine evict state; an unbounded stream-stream join would grow
    state forever and is refused by the planner without watermarks."""
    clicks, purchases = split_clicks_purchases(events)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts")
           <= F.col("click_ts") + F.expr(f"INTERVAL {JOIN_WINDOW}"))
    )
    return (
        clicks.join(purchases, cond)
        .select(
            F.col("p_user").alias("user_id"), "click_id", "purchase_id",
            F.col("click_ts").cast("long").alias("click_epoch_s"),
            F.col("purchase_ts").cast("long").alias("purchase_epoch_s"),
        )
    )
