"""applyInPandasWithState custom stateful operator: the streaming EWMA
must converge to the batch reference over an AvailableNow run."""

import math

from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import sessions as S
from impractical_impala_spark.streaming.stateful import user_ewma
from .streaming_refs import batch_ewma


def test_streaming_ewma_matches_batch(spark, sf_small):
    stream = S.read_events_stream(spark, sf_small)
    q = (
        user_ewma(stream)
        .writeStream.format("memory").queryName("t_ewma")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # last emitted row per user carries the final state
    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in spark.sql(
            "SELECT user_id, n_events, ewma_value FROM t_ewma"
        ).collect()
    }
    want = batch_ewma(load_table(spark, sf_small, "events"))
    assert len(got) == len(want)
    for _, row in want.iterrows():
        n, e = got[row.user_id]
        assert n == row.n_events
        assert math.isclose(e, row.ewma_value, rel_tol=1e-9)


def test_ewma_restart_from_checkpoint(spark, sf_small, tmp_path):
    """Kill/restart recovery for the CUSTOM state machine
    (applyInPandasWithState): per-user (count, ewma) tuples recovered
    from the state store must keep folding later micro-batches, and the
    final per-user row must equal the batch reference. Input files are
    contiguous event_id ranges written in order — the fold is
    id-ordered, so cross-batch arrival must be too."""
    import time as _time

    from pyspark.sql import functions as F

    data_dir = str(tmp_path / "events_by_id")
    pdf = (
        load_table(spark, sf_small, "events")
        .select("event_id", "ts_ns", "user_id", "event_type", "value", "props")
        .withColumnRenamed("ts_ns", "ts")
        .orderBy("event_id")
        .toPandas()
    )
    n = len(pdf)
    for i in range(4):
        spark.createDataFrame(pdf.iloc[i * n // 4:(i + 1) * n // 4],
                              schema=S.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(data_dir)
        _time.sleep(1.1)

    def stream():
        raw = (
            spark.readStream.schema(S.EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(data_dir)
        )
        return user_ewma(raw.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))))

    # memory sink cannot recover an update-mode query from a checkpoint;
    # foreachBatch + append parquet can (at-least-once on retry — the
    # max-n_events final-row extraction below is retry-idempotent)
    ckpt = str(tmp_path / "ewma_ckpt")
    sink_dir = str(tmp_path / "ewma_out")

    def write_batch(df, _bid):
        df.write.mode("append").parquet(sink_dir)

    q1 = (stream().writeStream.foreachBatch(write_batch)
          .outputMode("update").option("checkpointLocation", ckpt).start())
    deadline = _time.time() + 60
    while _time.time() < deadline:
        lp = q1.lastProgress
        if lp and lp.get("numInputRows", 0) > 0:
            break
        _time.sleep(0.2)
    q1.stop()  # crash: state store holds per-user (count, ewma)

    q2 = (stream().writeStream.foreachBatch(write_batch)
          .outputMode("update").option("checkpointLocation", ckpt).start())
    q2.processAllAvailable()
    q2.stop()
    out = spark.read.parquet(sink_dir).toPandas()

    # the final emission per user is the one with the largest n_events
    # (counts are strictly increasing across emissions)
    final = out.loc[out.groupby("user_id")["n_events"].idxmax()]
    got = {r.user_id: (r.n_events, r.ewma_value) for r in final.itertuples()}
    want = batch_ewma(load_table(spark, sf_small, "events"))
    assert len(got) == len(want)
    for row in want.itertuples():
        n_got, e_got = got[row.user_id]
        assert n_got == row.n_events
        assert math.isclose(e_got, row.ewma_value, rel_tol=1e-9)
