"""Streaming feed-freshness monitor — the incremental twin of
``queries/ops_quality.py::dq_freshness_sla``.

Per event type the state is (first_us, last_us, n_events, trailing-day
buffer): four scalars plus the timestamps of events within one DAY_US
of the feed's own newest event, pruned as the feed advances — the
buffer is bounded by one day of per-feed volume (the same retention
horizon the streaming dedup keeps), and everything else is O(types)
forever. Each micro-batch emits the refreshed state row for the types
it touched (outputMode("update") + memory sink keeps the latest row
per type), and ``finalize`` turns the final state table into the
EXACT batch audit: the global watermark is the max over per-type
last_us, last-day volume counts buffer entries newer than
wm - DAY_US, and the lag/SLA/daily-average arithmetic is the same
integer-microsecond / ppm formulas as the batch plan — so the
streamed audit is bit-equal to dq_freshness_sla over any micro-batch
chunking (the tests replay 8-file splits through a checkpoint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.ops_quality import DAY_US, SLA_LAG_US

STATE_SCHEMA = ("first_us LONG, last_us LONG, n LONG, buf ARRAY<LONG>")
OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("first_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("buf", T.ArrayType(T.LongType())),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        first_us, last_us, n, buf = state.get
        buf = list(buf)
    else:
        first_us = last_us = None
        n, buf = 0, []
    for pdf in pdfs:
        ts = (pdf["ts_ns"] // 1000).astype("int64").tolist()
        if not ts:
            continue
        n += len(ts)
        lo, hi = min(ts), max(ts)
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
        buf.extend(ts)
        # prune to the feed's own trailing day (retention horizon)
        buf = [t for t in buf if t > last_us - DAY_US]
    state.update((first_us, last_us, n, buf))
    yield pd.DataFrame({
        "event_type": [event_type], "first_us": [first_us],
        "last_us": [last_us], "n_events": [n], "buf": [sorted(buf)]})


def streaming_freshness_state(events: DataFrame) -> DataFrame:
    """events must carry ts_ns (epoch nanos) and event_type."""
    return (events.select("event_type", "ts_ns")
            .groupBy("event_type")
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def latest_state(rows: DataFrame) -> DataFrame:
    """Latest emitted state row per type from an update-mode memory
    sink (n_events is strictly increasing per emitted row per type,
    so max-n is the newest)."""
    w = Window.partitionBy("event_type").orderBy(F.col("n_events").desc())
    return (rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def finalize(state_rows: DataFrame) -> DataFrame:
    """Turn the final per-type state table into the batch audit —
    identical integer formulas to dq_freshness_sla (including the
    greatest(1, ...) daily-average floor)."""
    wm = state_rows.agg(F.max("last_us").alias("wm_us"))
    per = (state_rows.crossJoin(F.broadcast(wm))
           .withColumn("last_day_events", F.expr(
               f"size(filter(buf, t -> t > wm_us - {DAY_US}))")
               .cast("long")))
    return (per.select(
        "event_type", "n_events",
        F.expr("wm_us - last_us").alias("lag_us"),
        F.expr(f"cast(wm_us - last_us > {SLA_LAG_US} as int)")
        .alias("sla_breach"),
        "last_day_events",
        F.expr(f"case when last_us - first_us < {DAY_US}"
               f" then n_events else greatest(1, n_events * {DAY_US}"
               " div (last_us - first_us)) end").alias("daily_avg"),
        F.expr(f"case when last_us - first_us < {DAY_US}"
               " then 1000000 else last_day_events * 1000000 div"
               f" greatest(1, n_events * {DAY_US}"
               " div (last_us - first_us)) end")
        .alias("last_day_vs_avg_ppm"))
        .orderBy("event_type"))
