"""Streaming sources.

``rate_pageviews`` is the streaming analogue of the reference's
generator: where the reference throttles an in-memory iterator to ~1000
events/s with Thread.sleep (PageviewTimestampAssigner.scala:9), Spark's
``rate-micro-batch`` source produces a deterministic number of rows per
micro-batch with monotonic timestamps — same dense, in-order event
stream, no sleeping threads.

The event-time mapping mirrors Pageview.scala:19-27: row ``n`` of the
stream carries event time ``start + n·millis_between_events``, a url
uniform over 10 values, and a deterministic id.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.sources.generator import URL_COUNT, _epoch_ms


def rate_pageviews(
    spark: SparkSession,
    start: datetime,
    rows_per_batch: int = 1000,
    millis_between_events: int = 1000,
    url_count: int = URL_COUNT,
    seed: int = 42,
) -> DataFrame:
    """Unbounded pageview stream via rate-micro-batch.

    Deterministic per (seed, batch): value ``n`` → the same pageview on
    every run, so streaming tests replay identically.
    """
    start_ms = _epoch_ms(start)
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", 0)
        .load()
    )
    draw = F.pmod(F.xxhash64(F.col("value"), F.lit(seed)), F.lit(url_count))
    return rate.select(
        F.concat(F.lit("http://site.com/"), draw.cast("string")).alias("url"),
        F.timestamp_millis(
            (F.lit(start_ms) + F.col("value") * millis_between_events).cast("long")
        ).alias("ts"),
        F.md5(F.concat_ws("-", F.lit(seed), F.col("value"))).alias("event_id"),
    )
