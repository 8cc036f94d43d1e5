"""Streaming plans under Trigger.AvailableNow must converge to their
batch twins."""

import pytest

from impractical_impala_spark.sources import load_table
from impractical_impala_spark.streaming import sessions as S


@pytest.fixture(scope="module")
def events_stream(spark, sf_small):
    return S.read_events_stream(spark, sf_small)


def _batch_events(spark, sf_small):
    return load_table(spark, sf_small, "events")


def _rows(df, key_cols):
    return sorted(
        (tuple(r[c] for c in df.columns) for r in df.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )


def test_hourly_counts_stream_equals_batch(spark, events_stream, sf_small):
    got = S.run_available_now(S.hourly_event_counts(events_stream),
                              "t_hourly")
    want = S.hourly_event_counts(_batch_events(spark, sf_small))
    assert _rows(got, got.columns) == _rows(want, want.columns)


def test_sliding_avg_stream_equals_batch(spark, events_stream, sf_small):
    got = S.run_available_now(S.sliding_value_avg(events_stream), "t_sliding")
    want = S.sliding_value_avg(_batch_events(spark, sf_small))
    assert _rows(got, got.columns) == _rows(want, want.columns)


def test_session_window_stream_equals_batch(spark, events_stream, sf_small):
    got = S.run_available_now(S.user_sessions(events_stream), "t_sessions")
    want = S.user_sessions(_batch_events(spark, sf_small))
    assert _rows(got, got.columns) == _rows(want, want.columns)


def test_session_counts_match_gaps_and_islands(spark, sf_small):
    """The session_window plan and the window-function sessionization
    (events_sessionized query) must agree on the number of sessions per
    user."""
    from impractical_impala_spark.queries.streams import events_sessionized

    sw = S.user_sessions(_batch_events(spark, sf_small))
    gi = events_sessionized(spark, sf_small)
    a = {r["user_id"]: r["n"] for r in
         sw.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}
    b = {r["user_id"]: r["n"] for r in
         gi.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}
    assert a == b


def test_stream_dedup_converges_to_batch(spark, events_stream, sf_small):
    """An at-least-once feed (two readers of the same source unioned)
    deduped with dropDuplicatesWithinWatermark must yield each event
    exactly once — the batch distinct answer."""
    from impractical_impala_spark.streaming.dedup import dedup_events_stream

    feed = events_stream.unionByName(
        S.read_events_stream(spark, sf_small))
    deduped = dedup_events_stream(feed).select("event_id")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_dedup")
    n_batch = _batch_events(spark, sf_small).count()
    assert got.count() == n_batch
    assert got.distinct().count() == n_batch
