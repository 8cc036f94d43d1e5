"""Streaming Misra-Gries heavy hitters: AvailableNow convergence to the
batch twin, and the two MG guarantees (no false negatives above the
frequency threshold; bounded undercount) against exact counts."""

import pandas as pd
from pyspark.sql import functions as F

from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import heavyhitters as H
from . import streaming_refs as HREF
from impractical_impala_spark.streaming import sessions as S


def _run_stream(spark, sf_small, checkpoint):
    stream = H.streaming_heavy_hitters(S.read_events_stream(spark, sf_small))
    q = (stream.writeStream.format("memory").queryName("mg_out")
         .outputMode("update")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # update mode re-emits per batch; keep the LAST row per (shard, item)
    out = spark.sql("SELECT * FROM mg_out").toPandas()
    out = out.groupby(["shard", "item"], as_index=False).last()
    return out


def test_availablenow_matches_batch_twin(spark, sf_small, tmp_path):
    got = _run_stream(spark, sf_small, str(tmp_path / "ckpt"))
    want = HREF.batch_heavy_hitters(
        load_table(spark, sf_small, "events"))
    g = got.sort_values(["shard", "item"]).reset_index(drop=True)
    w = want.sort_values(["shard", "item"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["shard", "item", "est_count", "n_shard"]].astype("int64"),
        w[["shard", "item", "est_count", "n_shard"]].astype("int64"))


def test_mg_guarantees_vs_exact(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    summary = HREF.batch_heavy_hitters(ev)
    exact = (H._with_item(ev).groupBy("shard", "item")
             .agg(F.count(F.lit(1)).alias("n"))
             .toPandas())
    # eviction must actually exercise (CAP < keys per shard)
    assert exact.groupby("shard")["item"].count().min() > H.CAP
    for shard, g in exact.groupby("shard"):
        sub = summary[summary["shard"] == shard]
        n_shard = int(g["n"].sum())
        err = n_shard // (H.CAP + 1)
        est = dict(zip(sub["item"], sub["est_count"]))
        for _, row in g.iterrows():
            item, true_n = int(row["item"]), int(row["n"])
            if true_n > err:
                # no false negatives above the threshold
                assert item in est, (shard, item, true_n, err)
            if item in est:
                # estimates never overcount and undercount by <= err
                assert est[item] <= true_n <= est[item] + err


def test_mg_restart_from_checkpoint(spark, sf_small, tmp_path):
    """Kill-mid-stream resume of the Misra-Gries state: summaries
    half-built in phase 1 must continue folding phase-2 events out of
    the recovered state store, converging to the chronological batch
    twin — the custom-state recovery coverage for the eviction-bearing
    operator (summable window state recovers trivially; counter
    eviction does not)."""
    import time as _time

    from pyspark.sql import functions as F

    # ordered 4-chunk replay of the fixture (same shape the other
    # recovery tests use: chronological files = chronological batches)
    out = str(tmp_path / "mg_events")
    pdf = (load_table(spark, sf_small, "events")
           .select("event_id", "ts_ns", "user_id", "event_type",
                   "value", "props")
           .withColumnRenamed("ts_ns", "ts")
           .orderBy("ts").toPandas())
    n = len(pdf)
    for i in range(4):
        chunk = pdf.iloc[i * n // 4:(i + 1) * n // 4]
        spark.createDataFrame(chunk, schema=S.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(out)
        _time.sleep(1.1)

    def stream(max_files):
        raw = (spark.readStream.schema(S.EVENTS_SCHEMA)
               .option("maxFilesPerTrigger", max_files).parquet(out))
        ev = raw.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        return H.streaming_heavy_hitters(ev)

    # memory sink cannot recover an update-mode query from a
    # checkpoint; foreachBatch into parquet is the recoverable custom
    # sink (batch_id identifies each shard's LAST emission)
    ckpt = str(tmp_path / "mg_ckpt")
    res = str(tmp_path / "mg_out")

    def sink(bdf, bid):
        (bdf.withColumn("batch_id", F.lit(bid))
         .write.mode("append").parquet(res))

    q1 = (stream(1).writeStream.foreachBatch(sink)
          .outputMode("update").option("checkpointLocation", ckpt).start())
    deadline = _time.time() + 60
    while _time.time() < deadline:
        lp = q1.lastProgress
        if lp and lp.get("numInputRows", 0) > 0:
            break
        _time.sleep(0.2)
    q1.stop()  # crash simulation: partially-folded counters in state

    q2 = (stream(1).writeStream.foreachBatch(sink)
          .outputMode("update").option("checkpointLocation", ckpt).start())
    q2.processAllAvailable()
    q2.stop()
    allout = spark.read.parquet(res).toPandas()
    last = allout.groupby("shard")["batch_id"].transform("max")
    got = allout[allout["batch_id"] == last]

    # batch twin over the SAME chronological order (event_id order ==
    # ts order in this fixture replay)
    want = HREF.batch_heavy_hitters(load_table(spark, sf_small, "events"))
    g = got.sort_values(["shard", "item"]).reset_index(drop=True)
    w = want.sort_values(["shard", "item"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["shard", "item", "est_count", "n_shard"]].astype("int64"),
        w[["shard", "item", "est_count", "n_shard"]].astype("int64"))
