"""Streaming Page-Hinkley must equal the exact integer fold on the
completed-hour prefix — single-batch (AvailableNow) and multi-batch
(chunked replay with hour-splitting boundaries), like the
Holt-Winters streaming twin."""

import pandas as pd
from pyspark.sql import functions as F

from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import sessions as S
from impractical_impala_spark.streaming.page_hinkley import (
    HOUR_NS, ph_step, streaming_page_hinkley)

COLS = ["event_type", "t", "y", "depth_ppm", "alarm"]


def _prefix_reference(spark, sf_small) -> pd.DataFrame:
    """Pure-Python PH fold over each type's completed-hour prefix
    (every hour strictly before the type's last seen hour)."""
    ev = load_table(spark, sf_small, "events").select(
        "event_type", "ts_ns").toPandas()
    ev["hr"] = ev["ts_ns"] // HOUR_NS
    rows = []
    for etype, g in ev.groupby("event_type"):
        cnt = g.groupby("hr").size()
        full = cnt.reindex(range(cnt.index.min(), cnt.index.max() + 1),
                           fill_value=0)
        st = {"t": 0, "cum": 0, "m": 0, "mn": 0}
        out: list = []
        for x in full.tolist()[:-1]:  # last hour is pending downstream
            ph_step(st, int(x), out)
        rows.extend((etype, *r) for r in out)
    return (pd.DataFrame(rows, columns=COLS)
            .sort_values(["event_type", "t"]).reset_index(drop=True))


def test_streaming_ph_matches_fold_availablenow(spark, sf_small):
    stream = S.read_events_stream(spark, sf_small)
    q = (streaming_page_hinkley(stream)
         .writeStream.format("memory").queryName("t_ph")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = (spark.sql(f"SELECT {', '.join(COLS)} FROM t_ph").toPandas()
           .sort_values(["event_type", "t"]).reset_index(drop=True))
    want = _prefix_reference(spark, sf_small)
    pd.testing.assert_frame_equal(got, want)


def test_streaming_ph_state_crosses_microbatches(spark, sf_small,
                                                 tmp_path):
    """Same equivalence under 8-file chunked replay: the (pending
    hour, PH registers) state must survive batch boundaries that
    split an hour."""
    ev = load_table(spark, sf_small, "events").orderBy("event_id")
    n = ev.count()
    chunk = n // 8 + 1
    src = tmp_path / "replay"
    src.mkdir()
    pdf = ev.select("event_id", "ts", "user_id", "event_type", "value",
                    "props").toPandas().sort_values("ts")
    for i in range(8):
        part = pdf.iloc[i * chunk:(i + 1) * chunk]
        if len(part):
            part.to_parquet(src / f"events_{i:02d}.parquet", index=False)
    schema = spark.read.parquet(str(src / "events_00.parquet")).schema
    raw = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(str(src)))
    from pyspark.sql import types as T
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts_ns", F.col("ts"))
    elif isinstance(ts_type, T.TimestampNTZType):
        from impractical_impala_spark.sources.readers import (
            epoch_us_from_ntz)
        raw = raw.withColumn(
            "ts_ns", epoch_us_from_ntz(F.col("ts")) * F.lit(1000))
    else:
        raw = raw.withColumn(
            "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
    q = (streaming_page_hinkley(raw)
         .writeStream.format("memory").queryName("t_ph_multi")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = (spark.sql(f"SELECT {', '.join(COLS)} FROM t_ph_multi")
           .toPandas().sort_values(["event_type", "t"])
           .reset_index(drop=True))
    want = _prefix_reference(spark, sf_small)
    pd.testing.assert_frame_equal(got, want)


def test_streaming_ph_agrees_with_batch_query(spark, sf_small):
    """Reconstructing the batch query's summary from the streamed
    per-hour rows must agree on everything the completed-hour prefix
    determines (max depth / first alarm among completed hours)."""
    from impractical_impala_spark.registry import all_queries
    batch = {r["event_type"]: r for r in
             all_queries()["events_page_hinkley"]
             .build(spark, sf_small).collect()}
    ref = _prefix_reference(spark, sf_small)
    for etype, g in ref.groupby("event_type"):
        b = batch[etype]
        # the batch summary covers one extra (final) hour; the prefix
        # reconstruction can only ever be <= its max depth
        assert g["depth_ppm"].max() <= b["max_depth_ppm"]
        first = g.loc[g["alarm"], "t"].min() if g["alarm"].any() else -1
        if first != -1:
            assert b["first_alarm_t"] == first
