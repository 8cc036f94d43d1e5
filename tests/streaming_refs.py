"""Batch REFERENCE implementations for the streaming operators —
driver-side pandas loops the tests compare the distributed/stateful
plans against. They live under tests/ on purpose: product source
carries no toPandas() materializations (enforced by the
test_plan_hygiene grep gate)."""

import pandas as pd
from pyspark.sql import DataFrame

from impractical_impala_spark.streaming.stateful import EWMA_ALPHA
from impractical_impala_spark.streaming.heavyhitters import (
    _mg_fold, _with_item)


def batch_ewma(events: DataFrame) -> pd.DataFrame:
    """Sequential per-user EWMA in event_id order — what the stateful
    stream must converge to under Trigger.AvailableNow."""
    pdf = events.select("user_id", "event_id", "value").toPandas() \
        .sort_values(["user_id", "event_id"])
    rows = []
    for uid, g in pdf.groupby("user_id"):
        ewma = None
        for v in g["value"]:
            ewma = v if ewma is None else (
                EWMA_ALPHA * v + (1 - EWMA_ALPHA) * ewma)
        rows.append((uid, len(g), ewma))
    return pd.DataFrame(rows, columns=["user_id", "n_events", "ewma_value"])


def batch_heavy_hitters(events: DataFrame) -> pd.DataFrame:
    """Batch twin: the identical sharded Misra-Gries fold in
    chronological order."""
    pdf = _with_item(events).toPandas().sort_values("event_id")
    rows = []
    for shard, g in pdf.groupby("shard"):
        d = _mg_fold({}, g["item"].tolist())
        for it, c in d.items():
            rows.append((int(shard), int(it), int(c), len(g)))
    return pd.DataFrame(rows,
                        columns=["shard", "item", "est_count", "n_shard"])
