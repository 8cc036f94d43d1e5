"""The daily-family streaming twins (transfer entropy, Granger,
day-of-week ANOVA, Hurst, Pettitt, SPRT, Ljung-Box — and the seven VALUE-weighted
r14 siblings over the state's micro value sums) must finalize to
EXACTLY their batch queries — AvailableNow, chunked replay, and a
crash/restart through the same checkpoint. The daily counts/values fold
from the SAME hourly state the nine hourly monitors read (hr div 24,
exact integer sums; values take ONE trunc div to whole units after the
fold); the closing test pins the full THIRTY-finalizer fleet over
one state stream."""

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
from impractical_impala_spark.streaming import dow_anova as DW
from impractical_impala_spark.streaming import ewma as EW
from impractical_impala_spark.streaming import fano as FA
from impractical_impala_spark.streaming import gapfill as GF
from impractical_impala_spark.streaming import granger as GR
from impractical_impala_spark.streaming import hurst as HU
from impractical_impala_spark.streaming import ljung_box as LB
from impractical_impala_spark.streaming import monthly as MO
from impractical_impala_spark.streaming import pacf as PC
from impractical_impala_spark.streaming import peak_load as PL
from impractical_impala_spark.streaming import pettitt as PT
from impractical_impala_spark.streaming import profile_jsd as PJ
from impractical_impala_spark.streaming import quarterly as QR
from impractical_impala_spark.streaming import retail454 as R454
from impractical_impala_spark.streaming import retail454_month as R454M
from impractical_impala_spark.streaming import sprt as SP
from impractical_impala_spark.streaming import time_rollup as TR
from impractical_impala_spark.streaming import transfer_entropy as TE
from impractical_impala_spark.streaming import value_daily as VD
from impractical_impala_spark.streaming import value_ewma as VE

_Q = all_queries()

TWINS = {
    "te": (TE, "events_transfer_entropy",
           ["direction", "n_steps", "te_micro"]),
    "granger": (GR, "events_granger_causality",
                ["direction", "n_days", "f_micro", "causal"]),
    "dow_anova": (DW, "events_dow_anova",
                  ["event_type", "n_days", "f_micro", "dow_effect"]),
    "hurst": (HU, "events_hurst_exponent",
              ["n_days", "slope_micro", "hurst_micro"]),
    "pettitt": (PT, "events_pettitt_test",
                ["event_type", "n_days", "k_stat", "t_star", "p_micro",
                 "significant"]),
    "sprt": (SP, "events_sprt_sequential",
             ["d_idx", "x", "n", "llr_micro", "hit_upper", "hit_lower",
              "state"]),
    "ljung_box": (LB, "events_ljung_box",
                  ["event_type", "n_days", "q_micro", "white_noise"]),
    # value-weighted daily siblings (r14): same state, same shared
    # helpers, fed whole-unit daily VALUE sums off the micro state sums
    "te_value": (VD.te, "events_te_value",
                 ["direction", "n_steps", "te_micro"]),
    "granger_value": (VD.granger, "events_granger_value",
                      ["direction", "n_days", "f_micro", "causal"]),
    "dow_anova_value": (VD.dow_anova, "events_dow_anova_value",
                        ["event_type", "n_days", "f_micro",
                         "dow_effect"]),
    "hurst_value": (VD.hurst, "events_hurst_value",
                    ["n_days", "slope_micro", "hurst_micro"]),
    "pettitt_value": (VD.pettitt, "events_pettitt_value",
                      ["event_type", "n_days", "k_stat", "t_star",
                       "p_micro", "significant"]),
    "sprt_value": (VD.sprt, "events_sprt_value",
                   ["d_idx", "x", "n", "llr_micro", "hit_upper",
                    "hit_lower", "state"]),
    "ljung_box_value": (VD.ljung_box, "events_ljung_box_value",
                        ["event_type", "n_days", "q_micro",
                         "white_noise"]),
}

HOURLY = [
    (AC, "events_hourly_autocorr24", ["event_type", "n", "r24"]),
    (CU, "events_cusum_changepoint",
     ["event_type", "n_hours", "total_events", "cusum_scaled",
      "cp_hr"]),
    (PJ, "events_hourly_profile_jsd", ["t1", "t2", "jsd_micro"]),
    (PL, "events_peak_load_ratio",
     ["event_type", "n_hours", "mean_milli", "p95_load", "max_load",
      "par_ppm", "p95_ratio_ppm"]),
    (FA, "events_fano_burstiness",
     ["event_type", "n_hours", "n_events", "fano_milli"]),
    (EW, "events_ewma_hourly",
     ["event_type", "hr", "n_events", "ewma_milli"]),
    (BS, "events_cusum_binseg",
     ["event_type", "level", "seg_id", "seg_start_hr", "seg_n_hours",
      "seg_total", "cusum_scaled", "cp_hr"]),
    (PC, "events_pacf",
     ["event_type", "n_hours", "acf1", "acf2", "acf3", "pacf1",
      "pacf2", "pacf3"]),
    (BU, "events_burst_viterbi",
     ["event_type", "t", "y", "state", "margin_micro"]),
    (GF, "events_gapfill_locf",
     ["event_type", "hr", "n_events", "sum_value_locf", "is_gap"]),
    (TR, "events_time_rollup",
     ["grain", "event_type", "bucket", "n_events", "sum_value"]),
    (MO, "events_monthly_rollup",
     ["event_type", "month", "n_events", "n_active_days", "sum_value"]),
    (QR, "events_quarterly_rollup",
     ["event_type", "quarter", "n_events", "n_active_days",
      "sum_value"]),
    (R454, "events_retail454_rollup",
     ["event_type", "fq", "n_events", "n_active_days", "sum_value"]),
    (R454M, "events_retail454_months",
     ["event_type", "fm", "n_events", "n_active_days", "sum_value"]),
    (VE, "events_value_ewma_hourly",
     ["event_type", "hr", "value_micro", "vewma_milli"]),
]


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
def test_daily_twin_availablenow(twin, spark, split_dir, sf_small):
    mod, qname, cols = TWINS[twin]
    q = (_stream_state(spark, split_dir, max_files=100)
         .writeStream.format("memory").queryName(f"t_{twin}_an")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table(f"t_{twin}_an")
    pd.testing.assert_frame_equal(_got(spark, mod, rows, cols),
                                  _want(spark, sf_small, qname, cols))


@pytest.mark.parametrize("twin", sorted(TWINS))
def test_daily_twin_chunked_replay(twin, spark, split_dir, tmp_path,
                                   sf_small):
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


def test_daily_twin_restart_from_checkpoint(spark, split_dir, tmp_path,
                                            sf_small):
    """One restart run shared by the twelve daily twins (the state
    operator is identical; all twelve read the same recovered rows)."""
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


def test_one_state_stream_feeds_thirty_finalizers(spark, split_dir,
                                                  sf_small):
    """The shared hourly state serves THIRTY finalizers (nine
    count-only hourly + the four value-weighted r13 hourly twins + the
    r14 quarterly grain + the r15 4-5-4 retail fiscal quarter AND
    month grains + seven count daily + seven value daily) — one
    AvailableNow pass, thirty finalizes, thirty batch matches."""
    assert len(HOURLY) + len(TWINS) == 30
    q = (_stream_state(spark, split_dir, max_files=100)
         .writeStream.format("memory").queryName("t_thirty_state")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table("t_thirty_state")
    for mod, qname, cols in HOURLY + [TWINS[t] for t in sorted(TWINS)]:
        got = _got(spark, mod, rows, cols)
        want = _want(spark, sf_small, qname, cols)
        pd.testing.assert_frame_equal(got, want)


def test_daily_fold_truncation_composes_for_negative_hours(spark):
    """ADVICE r12 (dailyfold sign-safety), resolved by proof instead of
    a floor rewrite: both the fold (hr div 24, hr = ts_ns div HOUR_NS)
    and the batch spine (ts_ns div DAY_NS) are Spark truncating div,
    and trunc-div COMPOSES for positive divisors whatever the sign —
    trunc(trunc(x/a)/b) == trunc(x/(a*b)). Floor semantics in the fold
    would DISAGREE with the batch spine on pre-epoch timestamps (e.g.
    hr=-25: trunc(-25/24)=-1 but floor(-25/24)=-2). This pins the fold
    against a batch-identical spine over hour indices of both signs."""
    from impractical_impala_spark.streaming.dailyfold import (
        daily_counts_by_type, daily_counts_global)

    HOUR_NS = 3_600_000_000_000
    DAY_NS = 24 * HOUR_NS
    # hour indices straddling zero, incl. exact day boundaries
    hrs = [-49, -48, -25, -24, -23, -1, 0, 1, 23, 24, 25, 47, 48]
    ev = spark.createDataFrame(
        [("a", h * HOUR_NS + 1, 2) for h in hrs]
        + [("b", h * HOUR_NS, 3) for h in hrs],
        "event_type string, ts_ns long, c long")
    state = ev.selectExpr(
        "event_type", f"ts_ns div {HOUR_NS} as hr", "c")
    batch_by_type = (ev.selectExpr(
        "event_type", f"ts_ns div {DAY_NS} as d", "c")
        .groupBy("d", "event_type").agg({"c": "sum"})
        .withColumnRenamed("sum(c)", "c"))
    got = daily_counts_by_type(state).toPandas().sort_values(
        ["d", "event_type"]).reset_index(drop=True)
    want = batch_by_type.toPandas().sort_values(
        ["d", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    got_g = daily_counts_global(state).toPandas().sort_values(
        "d").reset_index(drop=True)
    want_g = (ev.selectExpr(f"ts_ns div {DAY_NS} as d", "c")
              .groupBy("d").agg({"c": "sum"})
              .withColumnRenamed("sum(c)", "c")
              .toPandas().sort_values("d").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_g, want_g)
