"""Batch twin of the stream-stream join (streaming/joins.py) —
driver-checkable with a DuckDB oracle. Times compare in integer epoch
units: the join runs at microsecond precision, outputs floor to epoch
seconds on both engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

WINDOW_US = 3_600_000_000  # 1 hour, matching streaming/joins.py


def events_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases joined to same-user clicks within the preceding hour
    (batch form of streaming/joins.py::click_purchase_join)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts_us").alias("click_us"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("purchase_us"))
    cond = ((F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_us") >= F.col("click_us"))
            & (F.col("purchase_us") <= F.col("click_us") + F.lit(WINDOW_US)))
    return clicks.join(purchases, cond).select(
        F.col("p_user").alias("user_id"), "click_id", "purchase_id",
        F.expr("click_us div 1000000").alias("click_epoch_s"),
        F.expr("purchase_us div 1000000").alias("purchase_epoch_s"),
    )


register("events_stream_join", events_stream_join, f"""
SELECT p.user_id, c.click_id, p.purchase_id,
       epoch_us(c.ts) // 1000000 AS click_epoch_s,
       epoch_us(p.ts) // 1000000 AS purchase_epoch_s
FROM (SELECT event_id AS click_id, user_id, ts FROM events
      WHERE event_type = 'click') c
JOIN (SELECT event_id AS purchase_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND epoch_us(p.ts) >= epoch_us(c.ts)
 AND epoch_us(p.ts) <= epoch_us(c.ts) + {WINDOW_US}
""", "interval click->purchase join (batch twin of the stream-stream join)")


def events_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/sessions.py::sliding_value_avg (1-hour
    windows every 15 min): F.window works identically in batch, so the
    twin IS the streaming plan minus the watermark. The oracle expands
    each event into its four containing windows via a 0..3 offset
    unnest — integer epoch arithmetic, engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.round(F.avg("value"), 6).alias("avg_value"),
             F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("win_start"),
            "avg_value", "n",
        )
    )


def events_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/dedup.py::dedup_events_stream: an
    at-least-once feed (every 2nd event delivered twice) deduped by
    event_id, then aggregated per type. Duplicate rows are bit-identical
    so the keep-one pick is deterministic; the streaming form bounds its
    dedup state with the watermark instead of the explicit distinct."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    feed = ev.unionByName(ev.filter(F.col("event_id") % 2 == 0))
    return (
        feed.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("event_type")
    )


register("events_dedup_counts", events_dedup_counts, """
WITH feed AS (
    SELECT event_id, event_type, value FROM events
    UNION ALL
    SELECT event_id, event_type, value FROM events WHERE event_id % 2 = 0
), deduped AS (
    SELECT DISTINCT event_id, event_type, value FROM feed
)
SELECT event_type, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM deduped
GROUP BY event_type
ORDER BY event_type
""", "at-least-once feed deduped by id (batch twin of streaming dedup)")


register("events_sliding_avg", events_sliding_avg, """
WITH expanded AS (
    SELECT value,
           (epoch_us(ts) // (15 * 60 * 1000000) - off.o)
               * (15 * 60 * CAST(1000000 AS BIGINT)) AS win_start_us
    FROM events
    CROSS JOIN (SELECT unnest(range(0, 4)) AS o) off
)
SELECT strftime(make_timestamp(win_start_us), '%Y-%m-%d %H:%M:%S')
           AS win_start,
       ROUND(AVG(value), 6) AS avg_value, COUNT(*) AS n
FROM expanded
GROUP BY win_start_us
""", "sliding 1h/15min window averages (batch twin of the streaming plan)")


# ---------------------------------------------------------- anomaly flag
# Batch twin of a streaming anomaly detector: z-score of each event's
# value against the trailing N events of its type. In Structured
# Streaming the same logic is applyInPandasWithState keeping a per-type
# ring buffer; here the trailing frame is a window spec, one shuffle on
# event_type. At 100 TB partition by (event_type, day-bucket) instead —
# a single hot type must not serialize onto one task.
ZSCORE_FRAME = 50
ZSCORE_T = 2.5


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates > 2.5 sample-sd from the trailing
    50-event mean of their type (full frames only — a part-filled frame
    has an inflated variance estimate)."""
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("event_type").orderBy("event_id")
         .rowsBetween(-(ZSCORE_FRAME - 1), 0))
    scored = ev.select(
        "event_id", "event_type", "value",
        F.count(F.lit(1)).over(w).alias("n"),
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
    )
    return (
        scored.filter((F.col("n") == ZSCORE_FRAME) & (F.col("sd") > 0))
        .withColumn("z", F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4))
        .filter(F.abs(F.col("z")) > ZSCORE_T)
        .select("event_id", "event_type", "value", "z")
    )


register("events_anomaly_zscore", events_anomaly_zscore, f"""
WITH scored AS (
    SELECT event_id, event_type, value,
           COUNT(*) OVER w AS n,
           AVG(value) OVER w AS mu,
           STDDEV_SAMP(value) OVER w AS sd
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN {ZSCORE_FRAME - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_id, event_type, value, ROUND((value - mu) / sd, 4) AS z
FROM scored
WHERE n = {ZSCORE_FRAME} AND sd > 0
  AND abs(ROUND((value - mu) / sd, 4)) > {ZSCORE_T}
""", "trailing-window z-score anomaly flag (batch twin of stateful detector)")
