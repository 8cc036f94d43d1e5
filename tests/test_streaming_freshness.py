"""Streaming freshness monitor must finalize to EXACTLY the batch
dq_freshness_sla audit — single AvailableNow run, 8-file chunked
replay, and a crash/restart through the same checkpoint."""

import time
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import freshness as FR
from impractical_impala_spark.streaming import sessions as S

_Q = all_queries()

COLS = ["event_type", "n_events", "lag_us", "sla_breach",
        "last_day_events", "daily_avg", "last_day_vs_avg_ppm"]


def _batch_want(spark, sf_small) -> pd.DataFrame:
    return (_Q["dq_freshness_sla"].build(spark, sf_small).toPandas()
            .sort_values("event_type").reset_index(drop=True))


def _got(spark, table: str) -> pd.DataFrame:
    final = FR.finalize(FR.latest_state(spark.table(table)))
    return (final.toPandas()[COLS]
            .sort_values("event_type").reset_index(drop=True))


def test_streaming_freshness_availablenow(spark, sf_small):
    stream = S.read_events_stream(spark, sf_small)
    q = (FR.streaming_freshness_state(stream)
         .writeStream.format("memory").queryName("t_fresh")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    pd.testing.assert_frame_equal(_got(spark, "t_fresh"),
                                  _batch_want(spark, sf_small)[COLS])


@pytest.fixture()
def split_dir(spark, sf_small, tmp_path):
    out = str(tmp_path / "events_split")
    (load_table(spark, sf_small, "events")
     .select("event_id", "ts_ns", "user_id", "event_type", "value",
             "props")
     .withColumnRenamed("ts_ns", "ts")
     .repartition(8)
     .write.mode("overwrite").parquet(out))
    return out


def _stream_state(spark, data_dir, max_files):
    raw = (spark.readStream.schema(S.EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", max_files)
           .parquet(data_dir))
    ev = raw.withColumnRenamed("ts", "ts_ns")
    return FR.streaming_freshness_state(ev)


def test_streaming_freshness_chunked_replay(spark, split_dir, tmp_path,
                                            sf_small):
    q = (_stream_state(spark, split_dir, max_files=1)
         .writeStream.format("memory").queryName("t_fresh_multi")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    pd.testing.assert_frame_equal(_got(spark, "t_fresh_multi"),
                                  _batch_want(spark, sf_small)[COLS])


def test_streaming_freshness_restart_from_checkpoint(
        spark, split_dir, tmp_path, sf_small):
    """Crash after the first micro-batch; the restart must rebuild the
    per-feed state (including the trailing-day buffer) from the
    checkpoint and still finalize to the exact batch audit. The sink
    is an idempotent per-batch parquet write (foreachBatch keyed on
    batch_id), the fault-tolerant pattern memory sinks can't offer."""
    ckpt = str(tmp_path / "ckpt2")
    sink = str(tmp_path / "state_rows")

    def write_batch(df, batch_id):
        (df.write.mode("overwrite")
         .parquet(f"{sink}/batch={batch_id}"))

    q1 = (_stream_state(spark, split_dir, max_files=1)
          .writeStream.foreachBatch(write_batch)
          .outputMode("update").option("checkpointLocation", ckpt)
          .start())
    deadline = time.time() + 60
    while time.time() < deadline:
        lp = q1.lastProgress
        if lp and lp.get("numInputRows", 0) > 0:
            break
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination()
    q2 = (_stream_state(spark, split_dir, max_files=1)
          .writeStream.foreachBatch(write_batch)
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    rows = spark.read.option("recursiveFileLookup", "false").parquet(
        *[str(p) for p in Path(sink).glob("batch=*")])
    final = FR.finalize(FR.latest_state(rows))
    got = (final.toPandas()[COLS]
           .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, _batch_want(spark, sf_small)[COLS])
