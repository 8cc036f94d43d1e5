"""Streaming drift monitor: per-type frozen-reference histograms with
integer KS-ppm output must EXACTLY match the local batch twin on the
same micro-batch slices (histograms are order-free folds, so this is an
equality check, not convergence), and a perturbed later batch must
raise a drift signal."""

import time as _time

import numpy as np
from pyspark.sql import functions as F

from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import sessions as S
from impractical_impala_spark.streaming.drift import (
    DRIFT_BINS, batch_drift_reference, ks_ppm, value_drift_monitor,
    value_histogram)


def _event_slices(spark, sf_small, n_slices=4):
    pdf = (load_table(spark, sf_small, "events")
           .select("event_id", "ts_ns", "user_id", "event_type", "value",
                   "props")
           .withColumnRenamed("ts_ns", "ts")
           .orderBy("event_id").toPandas())
    n = len(pdf)
    return [pdf.iloc[i * n // n_slices:(i + 1) * n // n_slices]
            for i in range(n_slices)]


def test_streaming_drift_matches_batch_twin(spark, sf_small, tmp_path):
    slices = _event_slices(spark, sf_small)
    data_dir = str(tmp_path / "events_slices")
    for s in slices:
        spark.createDataFrame(s, schema=S.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(data_dir)
        _time.sleep(1.1)

    raw = (spark.readStream.schema(S.EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(data_dir))
    q = (value_drift_monitor(raw)
         .writeStream.format("memory").queryName("t_drift")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = [tuple(r) for r in spark.sql(
        "SELECT event_type, n_ref, n_batch, ks_ppm, is_reference"
        " FROM t_drift").collect()]

    want = [tuple(r) for r in batch_drift_reference(
        [s.rename(columns={"ts": "ts_ns"}) for s in slices])
        .itertuples(index=False)]
    assert sorted(got) == sorted(want)
    # every type has exactly one frozen reference row
    refs = [g for g in got if g[4]]
    assert len(refs) == len({g[0] for g in got})
    # at least one non-reference comparison row was emitted
    assert any(not g[4] for g in got)


def test_perturbed_batch_raises_drift_signal():
    """A location shift must move the integer KS signal: reference
    uniform-ish values vs the same values shifted by half the range."""
    rng = np.random.default_rng(7)
    base = rng.uniform(0, 200, size=5000)
    ref = value_histogram(base)
    same = value_histogram(rng.uniform(0, 200, size=5000))
    shifted = value_histogram(base + 250.0)
    assert ks_ppm(ref, same) < 60_000          # same distribution: small
    assert ks_ppm(ref, shifted) > 500_000      # shifted: massive
    assert len(ref) == DRIFT_BINS


def test_drift_state_is_fixed_width(spark, sf_small, tmp_path):
    """The state per type is one DRIFT_BINS-long array frozen at first
    sight: re-running with twice the stream length must not grow the
    reference (n_ref stays the first batch's count)."""
    slices = _event_slices(spark, sf_small, n_slices=2)
    data_dir = str(tmp_path / "events_2x")
    doubled = slices + slices
    for i, s in enumerate(doubled):
        spark.createDataFrame(s, schema=S.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(data_dir)
        _time.sleep(1.1)
    raw = (spark.readStream.schema(S.EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(data_dir))
    q = (value_drift_monitor(raw)
         .writeStream.format("memory").queryName("t_drift2")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM t_drift2").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        n_refs = {r.n_ref for r in rs}
        assert len(n_refs) == 1, (et, n_refs)  # reference frozen
        assert sum(1 for r in rs if r.is_reference) == 1
