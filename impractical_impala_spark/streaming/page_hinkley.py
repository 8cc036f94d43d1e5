"""Streaming Page-Hinkley drift monitor (the streaming twin of
``queries/monitor_eval.py::events_page_hinkley``).

Per event type, the detector folds COMPLETED hours: events accumulate
into the current hour's count; when an event for a LATER hour arrives,
the pending hour folds through the PH recursion (gap hours fold as
real zeros — the dense-spine discipline) and one row per completed
hour emits. State is eight integers per type — O(types) forever —
and the fold is the IDENTICAL exact ppm integer arithmetic as the
batch query, so the streamed per-hour rows are bit-equal to a batch
fold over the same completed-hour prefix across any micro-batch
chunking (including boundaries that split an hour).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.monitor_eval import PH_DELTA_PPM, PH_LAMBDA_PPM

HOUR_NS = 3_600_000_000_000

# (first hour, current pending hour, pending count, hours folded,
#  cumulative count, PH sum m, running min of m)
STATE_SCHEMA = ("h0 LONG, cur_hr LONG, cur_cnt LONG, t LONG, cum LONG,"
                " m LONG, mn LONG")
OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("t", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("depth_ppm", T.LongType()),
    T.StructField("alarm", T.BooleanType()),
])


def ph_step(st: dict, x: int, out: list) -> None:
    """Fold ONE completed hour — exactly the batch query's ppm
    recursion (cum and t are positive, so Python // equals SQL div)."""
    st["t"] += 1
    st["cum"] += x
    term = x * 1_000_000 - st["cum"] * 1_000_000 // st["t"] - PH_DELTA_PPM
    st["m"] += term
    st["mn"] = min(st["mn"], st["m"])
    depth = st["m"] - st["mn"]
    out.append((st["t"], x, depth, depth > PH_LAMBDA_PPM))


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        h0, cur_hr, cur_cnt, t, cum, m, mn = state.get
        st = {"t": t, "cum": cum, "m": m, "mn": mn}
    else:
        h0 = cur_hr = None
        cur_cnt = 0
        st = {"t": 0, "cum": 0, "m": 0, "mn": 0}

    rows = [pdf[["ts_ns"]] for pdf in pdfs if len(pdf)]
    if not rows:
        if state.exists:
            state.update((h0, cur_hr, cur_cnt, st["t"], st["cum"],
                          st["m"], st["mn"]))
        return
    batch = pd.concat(rows).sort_values("ts_ns")
    out: list = []
    for ts_ns in batch["ts_ns"]:
        h = int(ts_ns) // HOUR_NS
        if cur_hr is None:
            h0, cur_hr = h, h
        elif h < cur_hr:
            # late arrival across micro-batches: its hour already
            # folded (completed hours are immutable) — dropping it is
            # the documented contract; counting it into cur_hr would
            # silently diverge from the batch fold
            continue
        elif h > cur_hr:
            ph_step(st, cur_cnt, out)            # complete cur_hr
            for _gap in range(cur_hr + 1, h):    # gap hours = zeros
                ph_step(st, 0, out)
            cur_hr, cur_cnt = h, 0
        cur_cnt += 1
    state.update((h0, cur_hr, cur_cnt, st["t"], st["cum"],
                  st["m"], st["mn"]))
    if out:
        yield pd.DataFrame({
            "event_type": event_type,
            "t": [r[0] for r in out],
            "y": [r[1] for r in out],
            "depth_ppm": [r[2] for r in out],
            "alarm": [r[3] for r in out],
        })


def streaming_page_hinkley(events: DataFrame) -> DataFrame:
    """Streaming per-type Page-Hinkley: one state row per event type
    (eight integers), one output row per COMPLETED hour carrying the
    exact ppm excursion depth and the alarm flag."""
    return (
        events.select("event_type", "ts_ns")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
