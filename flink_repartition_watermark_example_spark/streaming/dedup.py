"""Streaming exact deduplication, watermark-scoped.

The batch dedup family (operators/dedup.py) has a streaming sibling:
``dropDuplicates`` on a streaming DataFrame keeps per-key state forever
unless a watermark bounds it — ``dropDuplicatesWithinWatermark`` evicts
state once the watermark passes, which is the only shape that survives
an unbounded stream (state is O(keys-per-watermark-horizon), not
O(all keys ever)).

Reference tie-in: the reference never re-reads its `eventId`
(Pageview.scala:11) but generates it precisely as a dedup handle; this
module is that capability made real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_repartition_watermark_example_spark.streaming.eventtime import (
    ensure_event_time,
)


def dedup_stream(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate events by ``id_cols`` within the watermark
    horizon.  Duplicates arriving later than ``watermark_delay`` after
    the original are NOT caught (state already evicted) — that is the
    explicit at-scale contract."""
    marked = ensure_event_time(events, ts_col).withWatermark(
        ts_col, watermark_delay
    )
    return marked.dropDuplicatesWithinWatermark(id_cols)
