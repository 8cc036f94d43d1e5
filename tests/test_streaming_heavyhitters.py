"""Streaming Misra-Gries heavy hitters: AvailableNow convergence to the
batch twin, and the two MG guarantees (no false negatives above the
frequency threshold; bounded undercount) against exact counts."""

import pandas as pd
from pyspark.sql import functions as F

from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import heavyhitters as H
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
    want = H.batch_heavy_hitters(
        load_table(spark, sf_small, "events"))
    g = got.sort_values(["shard", "item"]).reset_index(drop=True)
    w = want.sort_values(["shard", "item"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["shard", "item", "est_count", "n_shard"]].astype("int64"),
        w[["shard", "item", "est_count", "n_shard"]].astype("int64"))


def test_mg_guarantees_vs_exact(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    summary = H.batch_heavy_hitters(ev)
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
