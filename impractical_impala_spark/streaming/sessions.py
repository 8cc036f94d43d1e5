"""Structured Streaming variants of the event-analytics operators.

The reference is batch-only (SURVEY.md §1.3); this is the extension
surface for the driver's ``events`` stream fixture. Everything is
standard Structured Streaming: file source -> event-time watermark ->
windowed/stateful aggregation -> sink. Batch twins of these plans are
registered as driver-checkable queries in queries/streams.py; the
streaming tests run the SAME plan with Trigger.AvailableNow and assert
it converges to the batch answer.

Scale notes: watermark + windowed aggs keep state bounded by (windows x
keys) regardless of input volume; session_window state is bounded by
active sessions. Shuffle partitions sized by session.py; state store is
the default HDFS-backed local store (RocksDB on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),  # nanosAsLong (see sources/readers.py)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch under AvailableNow; on a real deployment this is the
    kafka/file drop directory).

    File streams require a declared schema, and the fixture's ``ts`` has
    shipped as both TIMESTAMP(NANOS) (read as epoch-nano longs) and
    TIMESTAMP(MICROS) NTZ across generations — sniff the footer with a
    cheap batch metadata read and declare whichever is stored."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stored = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    schema = T.StructType([
        f if f.name != "ts" else T.StructField("ts", stored)
        for f in EVENTS_SCHEMA.fields
    ])
    # file-stream sources take a DIRECTORY; glob-filter to the events file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Watermarks require TZ-aware TIMESTAMP (EVENT_TIME_IS_NOT_ON_
    # TIMESTAMP_TYPE on NTZ), so the streaming path keeps the epoch
    # instant; window START values rendered by these plans follow the
    # session timezone — run streaming sessions in UTC (get_spark does).
    # The driver-checked batch twins use TIMESTAMP_NTZ and are
    # timezone-independent (sources/readers.py::ntz_from_epoch_us).
    if isinstance(stored, T.LongType):
        return (
            raw.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        )
    if isinstance(stored, T.TimestampNTZType):
        # NTZ wall-clock -> absolute instant: the streaming sessions run
        # UTC (get_spark), so the cast is an identity on the fields.
        from ..sources.readers import epoch_us_from_ntz
        us = epoch_us_from_ntz(F.col("ts"))
        return (
            raw.withColumn("ts_ns", us * F.lit(1000))
            .withColumn("ts", F.timestamp_micros(us))
        )
    return raw.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))


def hourly_event_counts(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type", "n", "sum_value",
        )
    )


def sliding_value_avg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding windows (1 hour, every 15 min) — overlap handled by the
    built-in window generator, no self-joins."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.round(F.avg("value"), 6).alias("avg_value"),
             F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "avg_value", "n",
        )
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes",
                  watermark: str = "2 hours") -> DataFrame:
    """Stateful sessionization with the built-in session_window (gap
    closes a session); state is bounded by active sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("session_value"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events", "session_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Execute a streaming plan over all currently-available input and
    return the materialized result (memory sink). This is the harness
    the tests and smoke checks use."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
