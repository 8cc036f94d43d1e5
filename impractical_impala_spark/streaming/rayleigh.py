"""Streaming Rayleigh diurnal monitor — the incremental twin of
``queries/spectral_info.py::events_rayleigh_diurnal``.

Per (event_type, hour-of-day) the state is ONE integer count —
strictly bounded at types x 24 FOREVER, the tightest state class of
any twin here (even the p-chart/SAX twins grow with the calendar).
Each micro-batch emits the refreshed hour counts it touched;
``finalize`` applies the IDENTICAL fixed-point trig fold as the batch
query (same 24 micro literals, same half-away quantization), so the
streamed resultant, mean phase, and Rayleigh verdict are bit-equal to
the batch ones over any chunking."""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.monitor_eval import _ha_sql as _ha
from ..queries.spectral_info import RAY_Z_CRIT_MICRO, _ray_trig_case

HOUR_NS = 3_600_000_000_000

STATE_SCHEMA = "c LONG"
OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("h", T.LongType()),
    T.StructField("c", T.LongType()),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    et, h = key
    (c,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        c += len(pdf)
    state.update((c,))
    yield pd.DataFrame({"event_type": [et], "h": [h], "c": [c]})


def streaming_rayleigh_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form)."""
    keyed = ev.select(
        "event_type",
        F.expr(f"(ts_ns div {HOUR_NS}) % 24").alias("h"))
    return (keyed.groupBy("event_type", "h")
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def latest_state(rows: DataFrame) -> DataFrame:
    """Newest emitted row per (type, hour) from an update-mode sink
    (c is strictly increasing per emitted row per key)."""
    w = Window.partitionBy("event_type", "h").orderBy(F.col("c").desc())
    return (rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_rayleigh_diurnal, fed from the
    accumulated (type, hour) counts instead of the fact table."""
    cosc = _ray_trig_case(math.cos)
    sinc = _ray_trig_case(math.sin)
    suff = (state_rows.groupBy("event_type")
            .agg(F.sum("c").alias("n"),
                 F.sum(F.expr(f"c * ({cosc})")).alias("sc"),
                 F.sum(F.expr(f"c * ({sinc})")).alias("ss")))
    r_bar = ("(sqrt(cast(sc as double) * sc + cast(ss as double) * ss)"
             " / (cast(n as double) * 1e6))")
    mean_h = (f"(pmod(atan2(cast(ss as double), cast(sc as double))"
              f" * 24.0 / (2 * pi()) + 24.0, 24.0))")
    z = f"(cast(n as double) * {r_bar} * {r_bar})"
    return (suff.select(
        "event_type", F.col("n").cast("long").alias("n_events"),
        F.expr(_ha(f"({mean_h}) * 1e3")).alias("mean_hour_milli"),
        F.expr(_ha(f"({r_bar}) * 1e6")).alias("r_bar_ppm"),
        F.expr(_ha(f"({z}) * 1e6")).alias("rayleigh_z_micro"),
        F.expr(f"cast({_ha(f'({z}) * 1e6')} >= {RAY_Z_CRIT_MICRO}"
               " as int)").alias("diurnal"))
        .orderBy("event_type"))
