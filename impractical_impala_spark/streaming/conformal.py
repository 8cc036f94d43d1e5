"""Streaming conformal-coverage monitor (the streaming twin of
``queries/operating_point``'s conformal discipline, shaped like
``streaming/drift.py``'s frozen-reference monitor).

Per event type, the FIRST micro-batch is the calibration set: its
ceil((n+1)(1-alpha))-th smallest centi-quantized value freezes as the
conformal threshold. Every later micro-batch emits its empirical
coverage (share of values <= threshold, integer ppm) plus the running
cumulative coverage — the online guarantee check: if the stream is
exchangeable with calibration, coverage concentrates at 1-alpha, and a
sustained drop is a distribution-shift alarm with a direct decision
semantics (the prediction set stopped covering).

State is FIVE integers per type — (n_cal, k_rank, thr_centi, cum_n,
cum_covered) — O(types) forever. The per-batch coverage is an exact
integer fold (counting is order-free within a batch); the cumulative
counters make the monitor chunk-arrival-robust for the running signal.
The batch twin in tests folds the identical slices locally, so the
equality check is exact, not convergent.

vs the batch query ``events_conformal_calibration``: the batch side
splits calibration/test by a deterministic md5 hash (order-free across
any partitioning); a stream cannot hash-split retroactively, so the
calibration set is the first batch — the documented streaming trade
(same as the drift monitor's fixed clip range).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONF_ALPHA_PCT = 10  # 90% target coverage (the batch query's contract)

STATE_SCHEMA = ("n_cal LONG, k_rank LONG, thr_centi LONG, "
                "cum_n LONG, cum_covered LONG")
OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("n_cal", T.LongType()),
    T.StructField("thr_centi", T.LongType()),
    T.StructField("n_batch", T.LongType()),
    T.StructField("coverage_ppm", T.LongType()),
    T.StructField("cum_coverage_ppm", T.LongType()),
    T.StructField("is_calibration", T.BooleanType()),
])


def centi_scores(values: "np.ndarray") -> "np.ndarray":
    """floor(value*100) on non-null values — the batch queries'
    quantization, identical in the streaming fold and the twin."""
    v = values[~np.isnan(values)]
    return np.floor(v * 100).astype(np.int64)


def calibrate(scores: "np.ndarray") -> tuple[int, int, int | None]:
    """(n_cal, k_rank, thr_centi): the exact split-conformal order
    statistic. k > n (tiny calibration) -> threshold None = +inf."""
    n = len(scores)
    k = ((100 - CONF_ALPHA_PCT) * (n + 1) + 99) // 100
    if k > n:
        return n, k, None
    return n, k, int(np.sort(scores, kind="stable")[k - 1])


def covered_count(scores: "np.ndarray", thr: int | None) -> int:
    return len(scores) if thr is None else int((scores <= thr).sum())


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    scores = centi_scores(np.concatenate(
        [pdf["value"].to_numpy(dtype=np.float64) for pdf in pdfs]))
    if not state.exists:
        n_cal, k, thr = calibrate(scores)
        state.update((n_cal, k, -1 if thr is None else thr, 0, 0))
        yield pd.DataFrame({
            "event_type": [event_type], "n_cal": [n_cal],
            "thr_centi": [thr], "n_batch": [n_cal],
            "coverage_ppm": [None], "cum_coverage_ppm": [None],
            "is_calibration": [True],
        })
        return
    n_cal, k, thr_raw, cum_n, cum_cov = state.get
    thr = None if thr_raw == -1 else int(thr_raw)
    n = len(scores)
    cov = covered_count(scores, thr)
    cum_n, cum_cov = int(cum_n) + n, int(cum_cov) + cov
    state.update((int(n_cal), int(k), thr_raw, cum_n, cum_cov))
    if n == 0:
        return
    yield pd.DataFrame({
        "event_type": [event_type], "n_cal": [int(n_cal)],
        "thr_centi": [thr], "n_batch": [n],
        "coverage_ppm": [cov * 1_000_000 // n],
        "cum_coverage_ppm": [cum_cov * 1_000_000 // cum_n],
        "is_calibration": [False],
    })


def conformal_coverage_monitor(events: DataFrame) -> DataFrame:
    """Streaming per-type conformal coverage: one O(1) state row per
    event type (frozen threshold + running counters), one output row
    per (type, micro-batch) carrying the integer-ppm coverage signal."""
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


def batch_conformal_reference(batches: list[pd.DataFrame]) -> pd.DataFrame:
    """Batch twin for tests: fold the same micro-batch slices locally.
    The calibration order statistic and the per-batch/cumulative counts
    are exact integers, so equality with the stream is bit-for-bit."""
    cal: dict[str, tuple[int, int, int | None]] = {}
    run: dict[str, tuple[int, int]] = {}
    rows = []
    for pdf in batches:
        for et, g in pdf.groupby("event_type"):
            scores = centi_scores(g["value"].to_numpy(dtype=np.float64))
            if et not in cal:
                cal[et] = calibrate(scores)
                run[et] = (0, 0)
                n_cal, _k, thr = cal[et]
                rows.append((et, n_cal, thr, n_cal, None, None, True))
                continue
            n_cal, _k, thr = cal[et]
            n = len(scores)
            cov = covered_count(scores, thr)
            cn, cc = run[et]
            cn, cc = cn + n, cc + cov
            run[et] = (cn, cc)
            if n == 0:
                continue
            rows.append((et, n_cal, thr, n, cov * 1_000_000 // n,
                         cc * 1_000_000 // cn, False))
    return pd.DataFrame(rows, columns=[
        "event_type", "n_cal", "thr_centi", "n_batch",
        "coverage_ppm", "cum_coverage_ppm", "is_calibration"])
