"""Streaming lag-24 autocorrelation must finalize to EXACTLY the batch
events_hourly_autocorr24 — AvailableNow, chunked replay, and a
crash/restart through the same checkpoint (the Rayleigh-twin test
shape)."""

import time
from pathlib import Path

import pandas as pd
import pytest

from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import autocorr as AC

_Q = all_queries()

COLS = ["event_type", "n", "r24"]


def _batch_want(spark, sf_small) -> pd.DataFrame:
    return (_Q["events_hourly_autocorr24"].build(spark, sf_small)
            .toPandas()[COLS].sort_values("event_type")
            .reset_index(drop=True))


def _got(spark, rows) -> pd.DataFrame:
    return (AC.finalize(AC.latest_state(rows)).toPandas()[COLS]
            .sort_values("event_type").reset_index(drop=True))


@pytest.fixture()
def split_dir(spark, sf_small, tmp_path):
    out = str(tmp_path / "ev_split")
    (load_table(spark, sf_small, "events")
     .select("event_id", "event_type", "ts_ns", "value")
     .repartition(8)
     .write.mode("overwrite").parquet(out))
    return out


def _stream_state(spark, data_dir, max_files):
    schema = spark.read.parquet(data_dir).schema
    raw = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", max_files)
           .parquet(data_dir))
    return AC.streaming_autocorr24_state(raw)


def test_streaming_autocorr_availablenow(spark, split_dir, sf_small):
    q = (_stream_state(spark, split_dir, max_files=100)
         .writeStream.format("memory").queryName("t_ac24")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    pd.testing.assert_frame_equal(_got(spark, spark.table("t_ac24")),
                                  _batch_want(spark, sf_small))


def test_streaming_autocorr_chunked_replay(spark, split_dir, tmp_path,
                                           sf_small):
    q = (_stream_state(spark, split_dir, max_files=1)
         .writeStream.format("memory").queryName("t_ac24_multi")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    pd.testing.assert_frame_equal(
        _got(spark, spark.table("t_ac24_multi")),
        _batch_want(spark, sf_small))


def test_streaming_autocorr_restart_from_checkpoint(
        spark, split_dir, tmp_path, sf_small):
    ckpt = str(tmp_path / "ckpt2")
    sink = str(tmp_path / "state_rows")

    def write_batch(df, batch_id):
        df.write.mode("overwrite").parquet(f"{sink}/batch={batch_id}")

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
    rows = spark.read.parquet(
        *[str(p) for p in Path(sink).glob("batch=*")])
    pd.testing.assert_frame_equal(_got(spark, rows),
                                  _batch_want(spark, sf_small))
