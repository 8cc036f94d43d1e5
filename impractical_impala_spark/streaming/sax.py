"""Streaming SAX monitor — the incremental twin of
``queries/forecast.py::events_sax_symbolic``.

Per (event_type, day) the state is ONE integer count — calendar-
bounded (types x stream horizon days), the p-chart/freshness state
discipline. Each micro-batch emits the refreshed day counts it
touched; ``finalize`` rebuilds the zero-filled spine from the state's
own day range and applies the IDENTICAL PAA / z-score / quartile-
breakpoint arithmetic as the batch query (same SAX_W, same micro
breakpoint, same half-away quantization), so the streamed SAX words
are bit-equal to the batch ones over any chunking. Day keys use the
same ``ts_ns div DAY_NS`` integer bin as the batch plan — session
timezone can never move a symbol."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.forecast import DAY_NS, SAX_BP_MICRO, SAX_W, _sax_ha

STATE_SCHEMA = "c LONG"
OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("d", T.LongType()),
    T.StructField("c", T.LongType()),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    et, d = key
    (c,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        c += len(pdf)
    state.update((c,))
    yield pd.DataFrame({"event_type": [et], "d": [d], "c": [c]})


def streaming_sax_state(ev: DataFrame) -> DataFrame:
    """``ev`` must carry event_type and ts_ns (the load_table form)."""
    keyed = ev.select("event_type",
                      F.expr(f"ts_ns div {DAY_NS}").alias("d"))
    return (keyed.groupBy("event_type", "d")
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def latest_state(rows: DataFrame) -> DataFrame:
    """Newest emitted row per (type, day) from an update-mode sink
    (c is strictly increasing per emitted row per key)."""
    w = Window.partitionBy("event_type", "d").orderBy(F.col("c").desc())
    return (rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def finalize(state_rows: DataFrame) -> DataFrame:
    """Identical arithmetic to events_sax_symbolic, fed from the
    accumulated (type, day) counts instead of the fact table."""
    rng = state_rows.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    # spine derives types/range from state_rows itself, so the join
    # back is a SELF-join; column-level aliases mint fresh attribute
    # ids (`et`, `d2`) so the analyzer never sees the same exprId on
    # both sides (hit with a memory sink, where every reference
    # shares one plan object — DataFrame.alias alone does not help)
    types = state_rows.select(F.col("event_type").alias("et")).distinct()
    spine = (types.crossJoin(F.broadcast(rng))
             .select("et", "dmin", "dmax",
                     F.explode(F.expr("sequence(dmin, dmax)")).alias("d2")))
    filled = (spine
              .join(state_rows,
                    (F.col("et") == F.col("event_type"))
                    & (F.col("d2") == F.col("d")), "left")
              .select(F.col("et").alias("event_type"),
                      "dmin", "dmax", F.col("d2").alias("d"),
                      F.coalesce(F.col("c"), F.lit(0)).alias("c")))
    stats = filled.groupBy("event_type").agg(
        F.sum("c").alias("s"), F.sum(F.expr("c * c")).alias("ss"),
        F.count(F.lit(1)).alias("n"))
    paa = (filled
           .withColumn("w", F.expr(
               f"(d - dmin) * {SAX_W} div (dmax - dmin + 1)"))
           .groupBy("event_type", "w")
           .agg(F.sum("c").alias("pn"), F.count(F.lit(1)).alias("pd")))
    var_num = "n * ss - s * s"
    z_micro = _sax_ha(
        f"case when ({var_num}) <= 0 then 0.0 else"
        " ((pn * n - s * pd) / (cast(pd as double) * n))"
        f" / sqrt(({var_num}) / (n * (n - 1.0))) * 1e6 end")
    sym = (f"case when z_micro < -{SAX_BP_MICRO} then 'a'"
           " when z_micro < 0 then 'b'"
           f" when z_micro < {SAX_BP_MICRO} then 'c' else 'd' end")
    symbols = (paa.join(stats, "event_type")
               .withColumn("z_micro", F.expr(z_micro))
               .withColumn("sym", F.expr(sym)))
    return (symbols.groupBy("event_type")
            .agg(F.expr("concat_ws('', transform(sort_array("
                        "collect_list(struct(w, sym))), x -> x.sym))")
                 .alias("sax_word"),
                 F.max("n").alias("n_days"),
                 F.sum(F.expr("cast(sym = 'a' as int)")).alias("n_a"),
                 F.sum(F.expr("cast(sym = 'b' as int)")).alias("n_b"),
                 F.sum(F.expr("cast(sym = 'c' as int)")).alias("n_c"),
                 F.sum(F.expr("cast(sym = 'd' as int)")).alias("n_d"))
            .orderBy("event_type"))
