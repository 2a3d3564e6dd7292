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


def kafka_pageviews(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """Kafka source for the pageview stream — the production stand-in
    for the reference's in-memory parallel collection (S1).

    Values are JSON ``{"url", "ts_ms", "event_id"}`` parsed JVM-side
    with ``from_json`` against an explicit schema (never inferred).
    Kafka partitions map 1:1 onto Spark input partitions, so the
    per-partition ordering the watermark logic needs (SURVEY §1.4)
    is whatever the producer guarantees per partition — same contract
    as Flink's per-partition watermarks. ``maxOffsetsPerTrigger``
    bounds micro-batch size so a backlogged topic cannot produce an
    unbounded first batch.

    The spark-sql-kafka connector jar is not bundled in this
    container, so this builds the plan only when the package is
    available and raises a clear error otherwise (tested); the option
    surface itself is the deliverable.
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    try:
        raw = reader.load()
    except Exception as e:  # connector jar absent in this container
        raise NotImplementedError(
            "Kafka connector (spark-sql-kafka) not on the classpath; "
            "submit with --packages org.apache.spark:spark-sql-kafka-0-10_2.13"
        ) from e
    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("ts_ms", LongType()),
            StructField("event_id", StringType()),
        ]
    )
    v = F.from_json(F.col("value").cast("string"), schema).alias("j")
    return raw.select(v).select(
        F.col("j.url").alias("url"),
        F.timestamp_millis(F.col("j.ts_ms")).alias("ts"),
        F.col("j.event_id").alias("event_id"),
    )
