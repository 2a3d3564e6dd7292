"""Stream-stream inner join with watermarked time bounds.

The reference has no joins at all (SURVEY §2.2: single linear pipeline,
Main.scala:21-27); this is part of the engine's extended streaming
surface.  Semantics follow Structured Streaming's interval-join
contract: both sides carry a watermark, the join condition bounds the
event-time distance, so each side's buffered state is evicted once the
other side's watermark passes the bound — state stays O(range·rate),
never unbounded.

At scale the join keys (user_id here) hash-partition both streams to
co-locate buffers; the time bound is the state-eviction lever — widen
it and state grows linearly, drop the watermark and state never
drains."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.streaming.eventtime import (
    ensure_event_time,
)


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream–static dimension enrichment: join a streaming fact
    against a batch dimension table.

    Structured Streaming executes this as a per-micro-batch join with
    NO streaming state at all — the dim side is a plain batch plan
    re-evaluated per trigger (so slowly-changing dims are re-read
    without restarting the query).  The explicit ``broadcast`` pins
    the 100 TB-safe physical shape: the stream never shuffles for the
    join, each task maps over its partition with a hashed copy of the
    dim.  Inner and left-outer are the supported modes for
    stream-static joins; right/full (static side preserved) are not,
    by Structured Streaming's contract.
    """
    return stream.join(F.broadcast(dim), on=on, how=how)


def interval_join_views_purchases(
    views: DataFrame,
    purchases: DataFrame,
    *,
    range_hours: int = 6,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Pairs each view with same-user purchases that happen within
    ``range_hours`` after it.  Both inputs must be streaming DataFrames
    with columns (event_id, ts, user_id)."""
    views = ensure_event_time(views)
    purchases = ensure_event_time(purchases)
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    return v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {range_hours} HOURS")
        ),
    ).select("view_id", "purchase_id", "user_id")


def interval_join_left_outer(
    views: DataFrame,
    purchases: DataFrame,
    *,
    range_hours: int = 6,
    watermark: str = "0 seconds",
    keep_view_ts: bool = False,
) -> DataFrame:
    """Left-outer interval join: every view emits exactly once — with
    its matching purchase, or with nulls once the purchase-side
    watermark proves no match can still arrive (view_ts + range has
    passed).  This is the streaming twin of the batch
    ``asof``/outer-join family: null emission is *watermark-driven
    finality*, not absence-at-query-time, so results are stable under
    replay.  Both sides need watermarks — the outer side's buffered
    rows are the join state, evicted at the same bound."""
    views = ensure_event_time(views)
    purchases = ensure_event_time(purchases)
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    return v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {range_hours} HOURS")
        ),
        how="leftOuter",
    ).select(
        "view_id",
        "purchase_id",
        "user_id",
        # close-sentinel replays need the event-time column to filter
        # sentinel views out of the output (queries_streaming)
        *(["view_ts"] if keep_view_ts else []),
    )
