"""Streaming first-touch (streaming/firsttouch.py) must converge to the
batch first-touch decomposition when the state horizon covers the
stream — including users whose first and later events arrive in
DIFFERENT micro-batches, which only dedupe if the user-key state
survives across batches. With a horizon shorter than the stream,
expired users legitimately re-count (the "resurrected" semantics), so
the per-day totals can only grow."""

import time as _time

import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.queries.analytics import events_cumulative_users
from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import sessions as S
from impractical_impala_spark.streaming.firsttouch import first_touch_daily


@pytest.fixture()
def ordered_events_dir(spark, sf_small, tmp_path):
    out = str(tmp_path / "events_ordered")
    pdf = (
        load_table(spark, sf_small, "events")
        .select("event_id", "ts_ns", "user_id", "event_type", "value", "props")
        .withColumnRenamed("ts_ns", "ts")
        .orderBy("ts")
        .toPandas()
    )
    n = len(pdf)
    for i in range(4):
        spark.createDataFrame(pdf.iloc[i * n // 4:(i + 1) * n // 4],
                              schema=S.EVENTS_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(out)
        _time.sleep(1.1)
    return out


def _stream(spark, ordered_dir):
    raw = (
        spark.readStream.schema(S.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(ordered_dir)
    )
    return raw.withColumnRenamed("ts", "ts_ns").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000")))


def _run(spark, df, name):
    # complete mode: a horizon covering the whole stream finalizes no
    # day window, so append would emit nothing at availableNow
    # termination — complete re-emits every window each trigger and the
    # memory sink holds the final table (fine at test scale; production
    # append simply trades the tail days for bounded sink writes)
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return {r.day: r.new_users for r in spark.table(name).collect()}


def test_first_touch_converges_to_batch(spark, ordered_events_dir, sf_small):
    got = _run(spark, first_touch_daily(_stream(spark, ordered_events_dir),
                                        watermark="35 days"), "ft_full")
    want = {r.day: r.new_users for r in
            events_cumulative_users(spark, sf_small).collect()}
    # the full-stream horizon keeps every user key alive, so the
    # streaming answer must equal batch first-touch exactly — which
    # requires user-key state to survive across micro-batches
    assert got == want


def test_short_horizon_resurrects(spark, ordered_events_dir, sf_small):
    got = _run(spark, first_touch_daily(_stream(spark, ordered_events_dir),
                                        watermark="1 day"), "ft_short")
    want = {r.day: r.new_users for r in
            events_cumulative_users(spark, sf_small).collect()}
    assert got
    # a user's true first arrival is always kept, so no day undercounts
    # the batch first-touch; expired keys re-count as new on days the
    # batch has no first-touch at all (want.get -> 0), and the stream
    # must resurrect someone somewhere (the fixture has users active
    # across gaps longer than a day)
    assert all(got[d] >= want.get(d, 0) for d in got)
    assert sum(got.values()) > sum(want.values())
