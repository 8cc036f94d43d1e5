"""Streaming Holt-Winters must equal the batch kernel on the
completed-day prefix — single-batch (AvailableNow over one file) and
multi-batch (chunked file replay, state crossing micro-batches)."""

import pandas as pd
from pyspark.sql import functions as F

from impractical_impala_spark.queries.forecast import events_holt_winters
from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import sessions as S
from impractical_impala_spark.streaming.forecast import (
    streaming_holt_winters)

COLS = ["event_type", "t", "y_centi", "level_centi", "trend_centi",
        "season_centi", "fitted_centi"]


def _batch_prefix(spark, sf_small) -> pd.DataFrame:
    """Batch kernel rows EXCLUDING each type's final day (the stream's
    tail day is always pending)."""
    full = events_holt_winters(spark, sf_small).toPandas()
    tmax = full.groupby("event_type").t.transform("max")
    return (full[full.t < tmax][COLS]
            .sort_values(["event_type", "t"]).reset_index(drop=True))


def test_streaming_hw_matches_batch_availablenow(spark, sf_small):
    stream = S.read_events_stream(spark, sf_small)
    q = (streaming_holt_winters(stream)
         .writeStream.format("memory").queryName("t_hw")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = (spark.sql(f"SELECT {', '.join(COLS)} FROM t_hw").toPandas()
           .sort_values(["event_type", "t"]).reset_index(drop=True))
    want = _batch_prefix(spark, sf_small)
    pd.testing.assert_frame_equal(got, want)


def test_streaming_hw_state_crosses_microbatches(spark, sf_small,
                                                 tmp_path):
    """The same equivalence when the events replay as 8 contiguous
    event_id-ordered files (one micro-batch each): the (l, b,
    seasonal-window, pending-day) state must survive every batch
    boundary, including boundaries that split a day."""
    ev = load_table(spark, sf_small, "events").orderBy("event_id")
    n = ev.count()
    chunk = n // 8 + 1
    src = tmp_path / "replay"
    src.mkdir()
    pdf = ev.select("event_id", "ts", "user_id", "event_type", "value",
                    "props").toPandas().sort_values("ts")
    for i in range(8):
        part = pdf.iloc[i * chunk:(i + 1) * chunk]
        if len(part):
            part.to_parquet(src / f"events_{i:02d}.parquet", index=False)
    schema = spark.read.parquet(str(src / "events_00.parquet")).schema
    raw = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(str(src)))
    from pyspark.sql import types as T
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # pandas wrote TIMESTAMP(NANOS); with nanosAsLong the column IS
        # the epoch-nano value
        raw = raw.withColumn("ts_ns", F.col("ts"))
    elif isinstance(ts_type, T.TimestampNTZType):
        from impractical_impala_spark.sources.readers import (
            epoch_us_from_ntz)
        raw = raw.withColumn(
            "ts_ns", epoch_us_from_ntz(F.col("ts")) * F.lit(1000))
    else:
        raw = raw.withColumn(
            "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
    q = (streaming_holt_winters(raw)
         .writeStream.format("memory").queryName("t_hw_multi")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = (spark.sql(f"SELECT {', '.join(COLS)} FROM t_hw_multi")
           .toPandas().sort_values(["event_type", "t"])
           .reset_index(drop=True))
    want = _batch_prefix(spark, sf_small)
    pd.testing.assert_frame_equal(got, want)


def test_streaming_hw_restart_from_checkpoint(spark, sf_small, tmp_path):
    """Kill/restart recovery: the (level, trend, seasonal-window,
    pending-day) state recovered from the checkpoint must keep folding
    later micro-batches, and the union of emissions must equal the
    batch prefix. Emissions are exactly-once per (type, t) in effect:
    each day folds once, so dedup on (event_type, t) keeping any row is
    retry-idempotent."""
    import time as _time

    import os

    data_dir = str(tmp_path / "hw_events")
    pdf = (load_table(spark, sf_small, "events")
           .select("event_id", "ts", "user_id", "event_type", "value",
                   "props")
           .toPandas().sort_values("ts"))
    n = len(pdf)
    os.makedirs(data_dir, exist_ok=True)
    for i in range(4):
        part = pdf.iloc[i * n // 4:(i + 1) * n // 4]
        part.to_parquet(os.path.join(data_dir, f"chunk_{i:02d}.parquet"),
                        index=False)

    schema = spark.read.parquet(os.path.join(
        data_dir, "chunk_00.parquet")).schema

    def stream():
        raw = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(data_dir))
        from pyspark.sql import types as T
        if isinstance(schema["ts"].dataType, T.LongType):
            raw = raw.withColumn("ts_ns", F.col("ts"))
        else:
            from impractical_impala_spark.sources.readers import (
                epoch_us_from_ntz)
            raw = raw.withColumn(
                "ts_ns", epoch_us_from_ntz(F.col("ts")) * F.lit(1000))
        return streaming_holt_winters(raw)

    ckpt = str(tmp_path / "hw_ckpt")
    sink_dir = str(tmp_path / "hw_out")

    def write_batch(df, _bid):
        df.write.mode("append").parquet(sink_dir)

    q1 = (stream().writeStream.foreachBatch(write_batch)
          .outputMode("update").option("checkpointLocation", ckpt).start())
    deadline = _time.time() + 60
    while _time.time() < deadline:
        lp = q1.lastProgress
        if lp and lp.get("numInputRows", 0) > 0:
            break
        _time.sleep(0.2)
    q1.stop()  # crash mid-stream: state holds the HW fold

    q2 = (stream().writeStream.foreachBatch(write_batch)
          .outputMode("update").option("checkpointLocation", ckpt).start())
    q2.processAllAvailable()
    q2.stop()

    got = (spark.read.parquet(sink_dir).toPandas()
           .drop_duplicates(subset=["event_type", "t"])
           [COLS].sort_values(["event_type", "t"]).reset_index(drop=True))
    want = _batch_prefix(spark, sf_small)
    pd.testing.assert_frame_equal(got, want)
