"""Streaming deduplication.

``dropDuplicates`` on a stream keeps seen-key state forever unless the
event-time column is part of the key; for key-only dedup the bounded-
state form is ``dropDuplicatesWithinWatermark`` (Spark ≥3.5): a key's
state is evicted once the watermark passes its first-seen event time —
the only semantics that survive unbounded streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame, keys: Sequence[str] = ("event_id",), watermark: str = "1 hour"
) -> DataFrame:
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))
