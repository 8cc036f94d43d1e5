"""Streaming hourly-rhythm JSD must finalize to EXACTLY the batch
events_hourly_profile_jsd — AvailableNow, chunked replay, and a
crash/restart through the same checkpoint (the Rayleigh/autocorr/CUSUM
twin test shape). Also pins that ONE hourly-count state stream now
feeds THREE finalizers (autocorr, CUSUM, rhythm JSD)."""

import time
from pathlib import Path

import pandas as pd
import pytest

from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import autocorr as AC
from impractical_impala_spark.streaming import cusum as CU
from impractical_impala_spark.streaming import profile_jsd as PJ

_Q = all_queries()

COLS = ["t1", "t2", "jsd_micro"]


def _batch_want(spark, sf_small) -> pd.DataFrame:
    return (_Q["events_hourly_profile_jsd"].build(spark, sf_small)
            .toPandas()[COLS].sort_values(COLS)
            .reset_index(drop=True))


def _got(spark, rows) -> pd.DataFrame:
    return (PJ.finalize(PJ.latest_state(rows)).toPandas()[COLS]
            .sort_values(COLS).reset_index(drop=True))


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
    return PJ.streaming_profile_jsd_state(raw)


def test_streaming_profile_jsd_availablenow(spark, split_dir, sf_small):
    q = (_stream_state(spark, split_dir, max_files=100)
         .writeStream.format("memory").queryName("t_pjsd")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    pd.testing.assert_frame_equal(_got(spark, spark.table("t_pjsd")),
                                  _batch_want(spark, sf_small))


def test_streaming_profile_jsd_chunked_replay(spark, split_dir, tmp_path,
                                              sf_small):
    q = (_stream_state(spark, split_dir, max_files=1)
         .writeStream.format("memory").queryName("t_pjsd_multi")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    pd.testing.assert_frame_equal(
        _got(spark, spark.table("t_pjsd_multi")),
        _batch_want(spark, sf_small))


def test_streaming_profile_jsd_restart_from_checkpoint(
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


def test_one_state_stream_feeds_three_finalizers(spark, split_dir,
                                                 sf_small):
    """The shared hourly-count state now serves THREE monitors — run
    one AvailableNow pass, finalize three ways, match all three batch
    queries."""
    q = (_stream_state(spark, split_dir, max_files=100)
         .writeStream.format("memory").queryName("t_tri_state")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table("t_tri_state")
    pd.testing.assert_frame_equal(_got(spark, rows),
                                  _batch_want(spark, sf_small))
    ac_cols = ["event_type", "n", "r24"]
    got_ac = (AC.finalize(AC.latest_state(rows)).toPandas()[ac_cols]
              .sort_values("event_type").reset_index(drop=True))
    want_ac = (_Q["events_hourly_autocorr24"].build(spark, sf_small)
               .toPandas()[ac_cols].sort_values("event_type")
               .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_ac, want_ac)
    cu_cols = ["event_type", "n_hours", "total_events",
               "cusum_scaled", "cp_hr"]
    got_cu = (CU.finalize(CU.latest_state(rows)).toPandas()[cu_cols]
              .sort_values("event_type").reset_index(drop=True))
    want_cu = (_Q["events_cusum_changepoint"].build(spark, sf_small)
               .toPandas()[cu_cols].sort_values("event_type")
               .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_cu, want_cu)
