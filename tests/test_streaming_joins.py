"""Stream-stream join: the AvailableNow run over time-ordered
micro-batches must converge to the batch twin — including matches that
SPAN batch boundaries, which only work if the click-side state store
holds clicks until the watermark passes their join horizon."""

import time as _time

import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.queries.streams_plus import events_stream_join
from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import sessions as S
from impractical_impala_spark.streaming.joins import click_purchase_join


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


def test_stream_stream_join_converges_to_batch(spark, ordered_events_dir,
                                               sf_small):
    raw = (
        spark.readStream.schema(S.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(ordered_events_dir)
    )
    ev = raw.withColumnRenamed("ts", "ts_ns").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    q = (
        click_purchase_join(ev)
        .writeStream.format("memory").queryName("ssj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.table("ssj").collect())
    want = sorted(tuple(r) for r in
                  events_stream_join(spark, sf_small).collect())
    assert len(got) > 0
    assert got == want
