"""Streaming Fano factor must finalize to EXACTLY the batch
events_fano_burstiness — AvailableNow, chunked replay, and a
crash/restart through the same checkpoint (the shared hourly-state
twin test shape). Also pins the full five-finalizer fleet over one
state stream."""

import time
from pathlib import Path

import pandas as pd
import pytest

from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import autocorr as AC
from impractical_impala_spark.streaming import cusum as CU
from impractical_impala_spark.streaming import fano as FA
from impractical_impala_spark.streaming import peak_load as PL
from impractical_impala_spark.streaming import profile_jsd as PJ

_Q = all_queries()

COLS = ["event_type", "n_hours", "n_events", "fano_milli"]


def _batch_want(spark, sf_small) -> pd.DataFrame:
    return (_Q["events_fano_burstiness"].build(spark, sf_small)
            .toPandas()[COLS].sort_values("event_type")
            .reset_index(drop=True))


def _got(spark, rows) -> pd.DataFrame:
    return (FA.finalize(FA.latest_state(rows)).toPandas()[COLS]
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
    return FA.streaming_fano_state(raw)


def test_streaming_fano_availablenow(spark, split_dir, sf_small):
    q = (_stream_state(spark, split_dir, max_files=100)
         .writeStream.format("memory").queryName("t_fano")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    pd.testing.assert_frame_equal(_got(spark, spark.table("t_fano")),
                                  _batch_want(spark, sf_small))


def test_streaming_fano_chunked_replay(spark, split_dir, tmp_path,
                                       sf_small):
    q = (_stream_state(spark, split_dir, max_files=1)
         .writeStream.format("memory").queryName("t_fano_multi")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    pd.testing.assert_frame_equal(
        _got(spark, spark.table("t_fano_multi")),
        _batch_want(spark, sf_small))


def test_streaming_fano_restart_from_checkpoint(
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


def test_one_state_stream_feeds_five_finalizers(spark, split_dir,
                                                sf_small):
    """The shared hourly-count state now serves FIVE monitors — run one
    AvailableNow pass, finalize five ways, match all five batch
    queries."""
    q = (_stream_state(spark, split_dir, max_files=100)
         .writeStream.format("memory").queryName("t_penta_state")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table("t_penta_state")
    pd.testing.assert_frame_equal(_got(spark, rows),
                                  _batch_want(spark, sf_small))
    checks = [
        (AC, "events_hourly_autocorr24", ["event_type", "n", "r24"]),
        (CU, "events_cusum_changepoint",
         ["event_type", "n_hours", "total_events", "cusum_scaled",
          "cp_hr"]),
        (PJ, "events_hourly_profile_jsd", ["t1", "t2", "jsd_micro"]),
        (PL, "events_peak_load_ratio",
         ["event_type", "n_hours", "mean_milli", "p95_load",
          "max_load", "par_ppm", "p95_ratio_ppm"]),
    ]
    for mod, qname, cols in checks:
        got = (mod.finalize(mod.latest_state(rows)).toPandas()[cols]
               .sort_values(cols).reset_index(drop=True))
        want = (_Q[qname].build(spark, sf_small).toPandas()[cols]
                .sort_values(cols).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
