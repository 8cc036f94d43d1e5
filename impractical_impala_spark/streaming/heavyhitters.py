"""Streaming heavy hitters with bounded state: sharded Misra-Gries
(space-saving) via ``applyInPandasWithState``.

The batch engine's exact heavy hitters (queries/curation.py::
text_heavy_hitters) needs the full corpus; a stream cannot hold it.
Misra-Gries tracks at most CAP counters per shard and guarantees:

- every item with true shard count > n_shard / (CAP + 1) is IN the
  summary (no false negatives above the threshold), and
- each reported estimate undercounts by at most the shard's total
  decrement budget err = (n_shard - sum(counts)) / (CAP + 1).

Items are sharded BY HASH, so each item lives in exactly one shard and
the global summary is the plain union of shard summaries — no cross-
shard merge logic, and state is O(SHARDS × CAP) forever, independent of
stream length. This is the canonical "top-k over an unbounded stream"
operator (the same shape as Spark's own streaming dropDuplicates state,
but with eviction).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SHARDS = 4
CAP = 8  # counters per shard — deliberately smaller than the key space

STATE_SCHEMA = ("items ARRAY<BIGINT>, counts ARRAY<BIGINT>, "
                "n_processed LONG")
OUTPUT_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("item", T.LongType()),
    T.StructField("est_count", T.LongType()),
    T.StructField("n_shard", T.LongType()),
])


def _mg_fold(d: dict, items) -> dict:
    for it in items:
        if it in d:
            d[it] += 1
        elif len(d) < CAP:
            d[it] = 1
        else:
            d = {k: c - 1 for k, c in d.items() if c > 1}
    return d


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (shard,) = key
    if state.exists:
        items, counts, n = state.get
        d = dict(zip(items, counts))
    else:
        d, n = {}, 0
    # A shard group's rows can span multiple Arrow chunks in shuffle
    # order; the MG fold is order-dependent, so concatenate ALL chunks
    # and sort ONCE by event_id before folding — otherwise the
    # AvailableNow==batch-twin convergence contract can flake whenever
    # a micro-batch's group crosses an arrow.maxRecordsPerBatch edge.
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks).sort_values("event_id")
        d = _mg_fold(d, pdf["item"].tolist())
        n += len(pdf)
    state.update((list(d.keys()), list(d.values()), n))
    yield pd.DataFrame({
        "shard": [shard] * len(d),
        "item": list(d.keys()),
        "est_count": list(d.values()),
        "n_shard": [n] * len(d),
    })


def _with_item(events: DataFrame) -> DataFrame:
    """Item = (user, hour-of-day): fine enough that the key space
    exceeds SHARDS × CAP even on the smallest fixture, so eviction —
    the part of MG worth testing — actually happens."""
    item = (F.col("user_id") * 32
            + F.expr("(ts_ns div 3600000000000) % 24")).alias("item")
    return events.select(
        item, "event_id",
        F.pmod(F.xxhash64(item), F.lit(SHARDS)).cast("int").alias("shard"))


def streaming_heavy_hitters(events: DataFrame) -> DataFrame:
    """Per-micro-batch Misra-Gries summaries over (user, hour) activity.
    State: SHARDS × CAP counters, forever."""
    return (
        _with_item(events)
        .groupBy("shard")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# The batch twin (identical sharded fold in chronological order) lives
# in tests/streaming_refs.py — product source carries no toPandas()
# materializations.
