"""Streaming deduplication — the training-data dedup surface's
streaming twin. An ingest pipeline sees the same record more than once
(at-least-once sources, retried producers); the scale-correct fix is
``dropDuplicatesWithinWatermark``: state holds only keys younger than
the watermark, so memory is bounded by (arrival rate x watermark
horizon) instead of growing with the stream's lifetime — an unbounded
``dropDuplicates`` on a stream is the classic state-leak anti-pattern.

Batch twin: ``queries/streams_plus.py::events_dedup_counts`` (same
dedup-then-aggregate shape over an explicitly duplicated frame, DuckDB
oracle). The streaming test unions two readers of the same source (a
deterministic duplicate feed) and asserts the deduped stream converges
to the batch answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events_stream(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-ify an at-least-once event stream: keep the first
    arrival of each event_id, expiring dedup state past the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
