"""Streaming Holt-Winters monitor (the streaming twin of
``queries/forecast.py::events_holt_winters``).

Per event type, daily revenue folds through the SAME exact integer
Holt-Winters recursion as the batch kernel (hw_fit): the first 7
complete days seed the seasonal state, every later completed day emits
one (level, trend, season, fitted) row. State is one fixed-width tuple
per type — the (l, b, 7-slot seasonal window) plus the pending day's
accumulator — O(types x 10) forever, regardless of stream length.

A day COMPLETES when a row from a later day arrives (the stream cannot
know a day ended otherwise), so the tail day is always pending — the
equivalence contract with the batch kernel is "all rows except the
final day", and gap days fold as real zeros (the dense-spine
discipline). Requires non-decreasing day arrival across batches (the
file-replay / sessions caveat); within a batch rows may be unordered.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.forecast import DAY_NS, HW_SEASON, _trunc_div

STATE_SCHEMA = ("d0 LONG, cur_day LONG, cur_sum LONG, "
                "seed ARRAY<LONG>, l LONG, b LONG, sw ARRAY<LONG>")
OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("t", T.LongType()),
    T.StructField("y_centi", T.LongType()),
    T.StructField("level_centi", T.LongType()),
    T.StructField("trend_centi", T.LongType()),
    T.StructField("season_centi", T.LongType()),
    T.StructField("fitted_centi", T.LongType()),
])


def _fold_day(st: dict, y: int, out: list) -> None:
    """Fold ONE completed day (exactly queries/forecast.hw_fit's step)."""
    t = st["t_next"]
    m = HW_SEASON
    if t < m:
        st["seed"].append(y)
        if len(st["seed"]) == m:
            mean7 = _trunc_div(sum(st["seed"]), m)
            st["l"], st["b"] = mean7, 0
            st["sw"] = [v - mean7 for v in st["seed"]]
    else:
        s_lag = st["sw"][t % m]
        fitted = st["l"] + st["b"] + s_lag
        new_l = _trunc_div(y - s_lag + st["l"] + st["b"], 2)
        new_b = _trunc_div(new_l - st["l"] + 3 * st["b"], 4)
        new_s = _trunc_div(y - new_l + 3 * s_lag, 4)
        st["l"], st["b"] = new_l, new_b
        st["sw"][t % m] = new_s
        out.append((t, y, new_l, new_b, new_s, fitted))
    st["t_next"] = t + 1


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        d0, cur_day, cur_sum, seed, l, b, sw = state.get
        st = {"seed": list(seed), "l": l, "b": b, "sw": list(sw)}
        st["t_next"] = (len(st["seed"]) if len(st["seed"]) < HW_SEASON
                        else cur_day - d0)  # days before cur_day folded
    else:
        d0 = cur_day = None
        cur_sum = 0
        st = {"seed": [], "l": 0, "b": 0, "sw": [], "t_next": 0}

    rows = [pdf[["ts_ns", "value"]] for pdf in pdfs if len(pdf)]
    if not rows:
        if state.exists:
            state.update((d0, cur_day, cur_sum, st["seed"],
                          st["l"], st["b"], st["sw"]))
        return
    batch = pd.concat(rows).sort_values("ts_ns")
    # Match the batch kernel's SUM(floor(value*100)) null handling:
    # SQL SUM skips NULLs, so NULL/NaN rows drop out of the day sum
    # here too (instead of int(NaN) raising and killing the query).
    batch = batch[batch["value"].notna()]
    out: list = []
    for ts_ns, value in zip(batch["ts_ns"], batch["value"]):
        d = int(ts_ns) // DAY_NS
        y = int(value * 100 // 1)  # floor(value*100): value >= 0
        if cur_day is None:
            d0, cur_day = d, d
        elif d > cur_day:
            _fold_day(st, cur_sum, out)          # complete cur_day
            for _gap in range(cur_day + 1, d):   # gap days = real zeros
                _fold_day(st, 0, out)
            cur_day, cur_sum = d, 0
        cur_sum += y
    state.update((d0, cur_day, cur_sum, st["seed"],
                  st["l"], st["b"], st["sw"]))
    if out:
        yield pd.DataFrame({
            "event_type": event_type,
            "t": [r[0] for r in out],
            "y_centi": [r[1] for r in out],
            "level_centi": [r[2] for r in out],
            "trend_centi": [r[3] for r in out],
            "season_centi": [r[4] for r in out],
            "fitted_centi": [r[5] for r in out],
        })


def streaming_holt_winters(events: DataFrame) -> DataFrame:
    """Streaming per-type Holt-Winters: one state row per event type,
    one output row per COMPLETED day from t = 7 on — bit-identical to
    the batch kernel on the same completed-day prefix."""
    return (
        events.select("event_type", "ts_ns", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
