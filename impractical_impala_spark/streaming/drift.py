"""Streaming distribution-drift monitor (the streaming twin of
``queries/drift.py::events_value_ks_drift``).

Per event type, the FIRST micro-batch freezes a quantized value
histogram as the reference distribution; every later micro-batch is
compared against it with the same integer-ppm KS statistic the batch
query uses. State is one fixed-length bin array per type —
O(types x DRIFT_BINS) forever, regardless of stream length — which is
the production shape for online drift alerting: the reference never
grows, each batch folds once, and the emitted statistic is an exact
integer (histogram accumulation is order-free, so unlike order-dependent
folds this operator is chunk-arrival-robust by construction).

A stream cannot know the global min/max, so the bin range is a FIXED
configured clip range (values outside clamp to the edge bins) — the
documented streaming trade vs the batch query's broadcast global range.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DRIFT_BINS = 64
DRIFT_LO = 0.0      # configured clip range: fixture values are ~[0, 500]
DRIFT_HI = 500.0

STATE_SCHEMA = "ref ARRAY<LONG>, n_ref LONG"
OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("n_ref", T.LongType()),
    T.StructField("n_batch", T.LongType()),
    T.StructField("ks_ppm", T.LongType()),
    T.StructField("is_reference", T.BooleanType()),
])


def value_histogram(values: "np.ndarray") -> "np.ndarray":
    """Clip-quantize values into DRIFT_BINS integer counts — identical
    math in the streaming fold and the batch twin."""
    pos = (values - DRIFT_LO) * DRIFT_BINS / (DRIFT_HI - DRIFT_LO)
    bins = np.clip(np.floor(pos).astype(np.int64), 0, DRIFT_BINS - 1)
    return np.bincount(bins, minlength=DRIFT_BINS).astype(np.int64)


def ks_ppm(ref: "np.ndarray", batch: "np.ndarray") -> int:
    """Integer-ppm KS distance between two bin-count vectors (the
    per-side ppm ECDF differencing of the batch query)."""
    n_ref, n_batch = int(ref.sum()), int(batch.sum())
    cum_r = np.cumsum(ref.astype(np.int64))
    cum_b = np.cumsum(batch.astype(np.int64))
    gaps = np.abs(cum_b * 1_000_000 // n_batch - cum_r * 1_000_000 // n_ref)
    return int(gaps.max())


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    values = np.concatenate(
        [pdf["value"].to_numpy(dtype=np.float64) for pdf in pdfs])
    hist = value_histogram(values)
    n = int(hist.sum())
    if not state.exists:
        state.update((hist.tolist(), n))
        yield pd.DataFrame({
            "event_type": [event_type], "n_ref": [n], "n_batch": [n],
            "ks_ppm": [0], "is_reference": [True],
        })
        return
    ref_list, n_ref = state.get
    ref = np.asarray(ref_list, dtype=np.int64)
    yield pd.DataFrame({
        "event_type": [event_type], "n_ref": [int(n_ref)], "n_batch": [n],
        "ks_ppm": [ks_ppm(ref, hist)], "is_reference": [False],
    })


def value_drift_monitor(events: DataFrame) -> DataFrame:
    """Streaming per-type drift monitor: one state row per event type
    (the frozen reference histogram), one output row per (type,
    micro-batch) carrying the integer KS-ppm drift signal."""
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_drift_reference(batches: list[pd.DataFrame]) -> pd.DataFrame:
    """Batch twin for tests: fold the same micro-batch slices locally.
    Histogram accumulation is order-free, so this is exact (not just
    convergent) against the streaming operator."""
    refs: dict[str, np.ndarray] = {}
    rows = []
    for pdf in batches:
        for et, g in pdf.groupby("event_type"):
            hist = value_histogram(g["value"].to_numpy(dtype=np.float64))
            n = int(hist.sum())
            if et not in refs:
                refs[et] = hist
                rows.append((et, n, n, 0, True))
            else:
                rows.append((et, int(refs[et].sum()), n,
                             ks_ppm(refs[et], hist), False))
    return pd.DataFrame(rows, columns=[
        "event_type", "n_ref", "n_batch", "ks_ppm", "is_reference"])
