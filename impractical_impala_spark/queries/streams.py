"""Batch twins of the streaming plans — driver-checkable with oracles.

The streaming module (streaming/sessions.py) runs the SAME logical
aggregations incrementally; tests assert the AvailableNow streaming run
equals these batch results. Window starts are emitted as formatted
strings (temporal-type rule) and the DuckDB oracle uses date_trunc /
gaps-and-islands SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation, batch form of
    streaming.sessions.hourly_event_counts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type", "n", "sum_value",
        )
    )


register("events_hourly_counts", events_hourly_counts, """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""", "tumbling hourly window (batch twin of the streaming plan)")


def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session) —
    batch twin of session_window, expressed as gaps-and-islands on the
    lossless nanosecond epoch so the oracle is integer-exact."""
    # microsecond resolution: DuckDB reads TIMESTAMP_NANOS as
    # microsecond TIMESTAMP, so the comparable epoch unit is us
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id",
                F.expr("ts_ns div 1000").alias("ts_us"), "value")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gap_us = 30 * 60 * 1_000_000
    new_session = (
        (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us)
        | F.lag("ts_us").over(w).isNull()
    ).cast("int")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    df = ev.withColumn("session_id", F.sum(new_session).over(cum))
    return (
        df.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


register("events_sessionized", events_sessionized, """
WITH ordered AS (
    SELECT user_id, epoch_us(ts) AS ts_us, value,
           LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
               AS prev_us
    FROM events
), flagged AS (
    SELECT *, CASE WHEN prev_us IS NULL
                     OR ts_us - prev_us > 30 * 60 * CAST(1000000 AS BIGINT)
                   THEN 1 ELSE 0 END AS new_session
    FROM ordered
), sessioned AS (
    SELECT user_id, ts_us, value,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
       ROUND(SUM(value), 4) AS session_value
FROM sessioned GROUP BY user_id, session_id
""", "30-min-gap sessionization (batch twin of session_window)")


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in session_window operator itself (batch form), oracle
    = the gaps-and-islands SQL (identical semantics: a >30-min gap
    closes a session; boundary ties are measure-zero on continuous
    timestamps). Session starts formatted to second precision."""
    from ..streaming.sessions import user_sessions

    return user_sessions(load_table(spark, sf_dir, "events").drop("props"))


register("events_session_window", events_session_window, """
WITH ordered AS (
    SELECT user_id, ts, value,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
    FROM events
), flagged AS (
    SELECT *, CASE WHEN prev_ts IS NULL
                     OR ts - prev_ts >= INTERVAL 30 MINUTE
                   THEN 1 ELSE 0 END AS new_session
    FROM ordered
), sessioned AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM sessioned GROUP BY user_id, session_id
""", "built-in session_window vs gaps-and-islands oracle")
