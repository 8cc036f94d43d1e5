"""Streaming conformal-coverage monitor: the frozen first-batch
threshold plus per-batch / cumulative coverage must EXACTLY match the
local batch twin on the same micro-batch slices (counting and the
calibration order statistic are exact integers), a location shift must
drop the coverage signal, and the state must survive a kill/restart
from checkpoint."""

import time as _time

import numpy as np
import pandas as pd

from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import sessions as S
from impractical_impala_spark.streaming.conformal import (
    CONF_ALPHA_PCT, batch_conformal_reference, calibrate, centi_scores,
    conformal_coverage_monitor, covered_count)

COLS = ["event_type", "n_cal", "thr_centi", "n_batch",
        "coverage_ppm", "cum_coverage_ppm", "is_calibration"]


def _event_slices(spark, sf_small, n_slices=4):
    pdf = (load_table(spark, sf_small, "events")
           .select("event_id", "ts_ns", "user_id", "event_type", "value",
                   "props")
           .withColumnRenamed("ts_ns", "ts")
           .orderBy("event_id").toPandas())
    n = len(pdf)
    return [pdf.iloc[i * n // n_slices:(i + 1) * n // n_slices]
            for i in range(n_slices)]


def _norm(rows):
    # Calibration rows carry NULL coverage; -1 is a sortable sentinel
    # outside the ppm domain (coverage >= 0), so the mapping is
    # bijective and tuple ordering stays well-defined.
    return sorted(tuple(-1 if pd.isna(v) else v for v in r)
                  for r in rows)


def test_streaming_conformal_matches_batch_twin(spark, sf_small,
                                                tmp_path):
    slices = _event_slices(spark, sf_small)
    data_dir = str(tmp_path / "events_slices")
    for s in slices:
        spark.createDataFrame(s, schema=S.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(data_dir)
        _time.sleep(1.1)

    raw = (spark.readStream.schema(S.EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(data_dir))
    q = (conformal_coverage_monitor(raw)
         .writeStream.format("memory").queryName("t_conf")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = _norm(spark.sql(
        f"SELECT {', '.join(COLS)} FROM t_conf").collect())

    want = _norm(batch_conformal_reference(slices)
                 .itertuples(index=False))
    assert got == want
    # exactly one calibration row per type, and comparison rows exist
    cal = [g for g in got if g[6]]
    assert len(cal) == len({g[0] for g in got})
    assert any(not g[6] for g in got)
    # exchangeable stream: cumulative coverage concentrates at 1-alpha
    last_cum = {}
    for g in got:
        if not g[6]:
            last_cum[g[0]] = g[5]
    for et, cum in last_cum.items():
        assert cum >= (100 - CONF_ALPHA_PCT) * 10_000 - 100_000, (et, cum)


def test_location_shift_drops_coverage():
    """A +3-sigma shifted batch must cover well below target while an
    exchangeable batch stays near it — the alarm the monitor exists
    to raise."""
    rng = np.random.default_rng(7)
    cal = rng.normal(100, 10, 2000)
    n_cal, k, thr = calibrate(centi_scores(cal))
    assert k == ((100 - CONF_ALPHA_PCT) * (n_cal + 1) + 99) // 100
    same = centi_scores(rng.normal(100, 10, 2000))
    shifted = centi_scores(rng.normal(130, 10, 2000))
    cov_same = covered_count(same, thr) * 1_000_000 // len(same)
    cov_shift = covered_count(shifted, thr) * 1_000_000 // len(shifted)
    assert cov_same > 870_000
    assert cov_shift < 500_000


def test_conformal_restart_from_checkpoint(spark, sf_small, tmp_path):
    """Kill the query after the first two batches; a restart from the
    same checkpoint must not re-calibrate or double-count the
    cumulative coverage — the sink's union equals the uninterrupted
    replay. Memory sinks cannot recover a checkpoint, so the sink is
    foreachBatch -> append parquet (the streaming/forecast.py test
    pattern); full-row dedup makes retries idempotent because cum_n
    strictly increases per type across batches."""
    slices = _event_slices(spark, sf_small)
    data_dir = str(tmp_path / "events_replay")
    ckpt = str(tmp_path / "ckpt")
    sink_dir = str(tmp_path / "conf_out")

    def write_batch(df, _bid):
        df.write.mode("append").parquet(sink_dir)

    def run():
        raw = (spark.readStream.schema(S.EVENTS_SCHEMA)
               .option("maxFilesPerTrigger", 1).parquet(data_dir))
        q = (conformal_coverage_monitor(raw)
             .writeStream.foreachBatch(write_batch)
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()

    for s in slices[:2]:
        spark.createDataFrame(s, schema=S.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(data_dir)
        _time.sleep(1.1)
    run()  # crash simulation after the first two batches

    for s in slices[2:]:
        spark.createDataFrame(s, schema=S.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(data_dir)
        _time.sleep(1.1)
    run()  # recovery: must resume from the committed offsets + state

    sink = spark.read.parquet(sink_dir).select(*COLS).collect()
    got = _norm(set(tuple(r) for r in sink))
    want = _norm(batch_conformal_reference(slices).itertuples(index=False))
    assert got == want
