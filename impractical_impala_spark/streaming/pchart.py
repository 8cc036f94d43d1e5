"""Streaming Shewhart p-chart — the incremental twin of
``queries/ops_quality.py::lineitem_pchart_returns``.

Per ship-month the state is two integers (line count, returned
count) — O(months) forever; each micro-batch emits the refreshed
counts for the months it touched, and ``finalize`` applies the
IDENTICAL centerline/3-sigma arithmetic as the batch query (global
p-bar from the summed state, per-month limits via the shared
half-away ppm quantization), so the streamed chart is bit-equal to
the batch one over any chunking. The month key uses the same
year/month expression as the batch plan, so the two sides always
agree whatever the session timezone is."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.monitor_eval import _ha_sql

STATE_SCHEMA = "n LONG, nr LONG"
OUTPUT_SCHEMA = T.StructType([
    T.StructField("m", T.IntegerType()),
    T.StructField("n", T.LongType()),
    T.StructField("nr", T.LongType()),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (m,) = key
    n, nr = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        nr += int(pdf["r"].sum())
    state.update((n, nr))
    yield pd.DataFrame({"m": [m], "n": [n], "nr": [nr]})


def streaming_pchart_state(li: DataFrame) -> DataFrame:
    """``li`` must carry l_shipdate (timestamp) and l_returnflag."""
    keyed = li.select(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
        F.expr("cast(l_returnflag = 'R' as int)").alias("r"))
    return (keyed.groupBy("m")
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def latest_state(rows: DataFrame) -> DataFrame:
    """Newest emitted row per month from an update-mode memory sink
    (n is strictly increasing per emitted row per month)."""
    w = Window.partitionBy("m").orderBy(F.col("n").desc())
    return (rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to lineitem_pchart_returns."""
    tot = state_rows.agg(F.sum("n").alias("gn"), F.sum("nr").alias("gr"))
    sig = ("sqrt((cast(gr as double) / gn)"
           " * (1.0 - cast(gr as double) / gn) / n)")
    ucl = _ha_sql(f"(cast(gr as double) / gn + 3.0 * {sig}) * 1e6")
    lcl = _ha_sql(f"greatest(cast(gr as double) / gn - 3.0 * {sig}, 0.0)"
                  " * 1e6")
    return (state_rows.crossJoin(F.broadcast(tot))
            .withColumn("p_ppm", F.expr("nr * 1000000 div n"))
            .withColumn("pbar_ppm", F.expr("gr * 1000000 div gn"))
            .withColumn("ucl_ppm", F.expr(ucl))
            .withColumn("lcl_ppm", F.expr(lcl))
            .withColumn("ooc", F.expr(
                "cast(p_ppm > ucl_ppm or p_ppm < lcl_ppm as int)"))
            .select("m", "n", "nr", "p_ppm", "pbar_ppm",
                    "ucl_ppm", "lcl_ppm", "ooc")
            .orderBy("m"))
