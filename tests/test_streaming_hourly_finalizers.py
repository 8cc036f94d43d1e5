"""The binseg / PACF / burst-Viterbi / gap-fill / time-rollup /
monthly-rollup / value-EWMA streaming twins must finalize to EXACTLY
their batch queries — AvailableNow, chunked replay, and a
crash/restart through the same checkpoint, parametrized over the twins
(the shared hourly-state test shape; gap-fill, time-rollup, monthly
and value-EWMA are the value-weighted r13 additions). The closing test
pins the full THIRTEEN-finalizer hourly fleet over one state
stream."""

import time
from pathlib import Path

import pandas as pd
import pytest

from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import autocorr as AC
from impractical_impala_spark.streaming import binseg as BS
from impractical_impala_spark.streaming import burst as BU
from impractical_impala_spark.streaming import cusum as CU
from impractical_impala_spark.streaming import ewma as EW
from impractical_impala_spark.streaming import fano as FA
from impractical_impala_spark.streaming import gapfill as GF
from impractical_impala_spark.streaming import monthly as MO
from impractical_impala_spark.streaming import pacf as PC
from impractical_impala_spark.streaming import peak_load as PL
from impractical_impala_spark.streaming import profile_jsd as PJ
from impractical_impala_spark.streaming import time_rollup as TR
from impractical_impala_spark.streaming import value_ewma as VE

_Q = all_queries()

TWINS = {
    "binseg": (BS, "events_cusum_binseg",
               ["event_type", "level", "seg_id", "seg_start_hr",
                "seg_n_hours", "seg_total", "cusum_scaled", "cp_hr"]),
    "pacf": (PC, "events_pacf",
             ["event_type", "n_hours", "acf1", "acf2", "acf3",
              "pacf1", "pacf2", "pacf3"]),
    "burst": (BU, "events_burst_viterbi",
              ["event_type", "t", "y", "state", "margin_micro"]),
    # the value-weighted finalizers (r13): these read the state's micro
    # value sum s, not just the count
    "gapfill": (GF, "events_gapfill_locf",
                ["event_type", "hr", "n_events", "sum_value_locf",
                 "is_gap"]),
    "time_rollup": (TR, "events_time_rollup",
                    ["grain", "event_type", "bucket", "n_events",
                     "sum_value"]),
    "monthly": (MO, "events_monthly_rollup",
                ["event_type", "month", "n_events", "n_active_days",
                 "sum_value"]),
    "value_ewma": (VE, "events_value_ewma_hourly",
                   ["event_type", "hr", "value_micro", "vewma_milli"]),
}


def _want(spark, sf_small, qname, cols) -> pd.DataFrame:
    return (_Q[qname].build(spark, sf_small).toPandas()[cols]
            .sort_values(cols).reset_index(drop=True))


def _got(spark, mod, rows, cols) -> pd.DataFrame:
    return (mod.finalize(mod.latest_state(rows)).toPandas()[cols]
            .sort_values(cols).reset_index(drop=True))


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


@pytest.mark.parametrize("twin", sorted(TWINS))
def test_twin_availablenow(twin, spark, split_dir, sf_small):
    mod, qname, cols = TWINS[twin]
    q = (_stream_state(spark, split_dir, max_files=100)
         .writeStream.format("memory").queryName(f"t_{twin}_an")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table(f"t_{twin}_an")
    pd.testing.assert_frame_equal(_got(spark, mod, rows, cols),
                                  _want(spark, sf_small, qname, cols))


@pytest.mark.parametrize("twin", sorted(TWINS))
def test_twin_chunked_replay(twin, spark, split_dir, tmp_path, sf_small):
    mod, qname, cols = TWINS[twin]
    q = (_stream_state(spark, split_dir, max_files=1)
         .writeStream.format("memory").queryName(f"t_{twin}_ck")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table(f"t_{twin}_ck")
    pd.testing.assert_frame_equal(_got(spark, mod, rows, cols),
                                  _want(spark, sf_small, qname, cols))


def test_twin_restart_from_checkpoint(spark, split_dir, tmp_path,
                                      sf_small):
    """One restart run shared by the three twins (the state operator is
    identical; only finalizers differ, and all three read the same
    recovered state rows)."""
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
    for twin in sorted(TWINS):
        mod, qname, cols = TWINS[twin]
        pd.testing.assert_frame_equal(
            _got(spark, mod, rows, cols),
            _want(spark, sf_small, qname, cols))


def test_one_state_stream_feeds_thirteen_finalizers(spark, split_dir,
                                                    sf_small):
    """The shared hourly state serves THIRTEEN hourly finalizers (nine
    count-only monitors + the four value-weighted r13 twins) — one
    AvailableNow pass, thirteen finalizes, thirteen batch matches."""
    q = (_stream_state(spark, split_dir, max_files=100)
         .writeStream.format("memory").queryName("t_thirteen_state")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table("t_thirteen_state")
    checks = [
        (AC, "events_hourly_autocorr24", ["event_type", "n", "r24"]),
        (CU, "events_cusum_changepoint",
         ["event_type", "n_hours", "total_events", "cusum_scaled",
          "cp_hr"]),
        (PJ, "events_hourly_profile_jsd", ["t1", "t2", "jsd_micro"]),
        (PL, "events_peak_load_ratio",
         ["event_type", "n_hours", "mean_milli", "p95_load",
          "max_load", "par_ppm", "p95_ratio_ppm"]),
        (FA, "events_fano_burstiness",
         ["event_type", "n_hours", "n_events", "fano_milli"]),
        (EW, "events_ewma_hourly",
         ["event_type", "hr", "n_events", "ewma_milli"]),
    ] + [TWINS[t] for t in sorted(TWINS)]
    for mod, qname, cols in checks:
        got = _got(spark, mod, rows, cols)
        want = _want(spark, sf_small, qname, cols)
        pd.testing.assert_frame_equal(got, want)
