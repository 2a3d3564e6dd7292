"""Streaming query registration for the driver contract.

``streaming_windowed_count`` actually exercises Structured Streaming
inside the correctness gate: it replays the events table through a
file-stream source, runs the reference pipeline (S5-S10) as an
incremental stateful aggregation, drains it with availableNow, and
returns the materialized result — which must equal the plain batch
GROUP BY, so the DuckDB oracle applies.  Complete output mode is used
because the replay is bounded (no source-close watermark exists for a
read-only input dir; see streaming/replica.py for the append-mode
sentinel encoding)."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.queries import register
from flink_repartition_watermark_example_spark.sources.tables import load_table


@register(
    "streaming_windowed_count",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS aggregate
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="The flagship query run THROUGH Structured Streaming: file-"
    "stream replay of events, incremental stateful windowed count, "
    "availableNow drain — result must equal the batch GROUP BY.",
)
def q_streaming_windowed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events")  # sets the nanosAsLong conf
    name = "stream_wc_" + uuid.uuid4().hex[:8]
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = (
        spark.readStream.schema(raw_schema)  # ts arrives as long nanos
        # file streams take directories; select just the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("aggregate"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "aggregate",
        )
    )
    # State-partition count is fixed at query start from
    # spark.sql.shuffle.partitions; a bounded single-file replay with a
    # handful of keys needs few state stores, and every extra one costs
    # a per-batch snapshot+commit.  Real deployments size this to
    # sustained key cardinality/throughput instead (it cannot be changed
    # across restarts of the same checkpoint).
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        with tempfile.TemporaryDirectory(dir=ckpt_base) as ckpt:
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    # Materialize off the transient memory sink before it is replaced.
    rows = spark.table(name).collect()
    return spark.createDataFrame(rows, agg.schema)


@register(
    "streaming_interval_join",
    """
    SELECT a.event_id AS view_id, b.event_id AS purchase_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
     AND a.event_type = 'view' AND b.event_type = 'purchase'
    """,
    doc="Stream-stream interval join run THROUGH Structured Streaming: "
    "two watermarked file-stream replays of events (views / purchases) "
    "joined on user_id with a 6-hour event-time bound, availableNow "
    "drain — must equal the batch range join, so the same oracle "
    "applies. The time bound is what lets each side's buffered state "
    "be evicted as the other side's watermark advances.",
)
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.streaming.join import (
        interval_join_views_purchases,
    )

    load_table(spark, sf_dir, "events")  # sets the nanosAsLong conf
    name = "stream_ij_" + uuid.uuid4().hex[:8]
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema

    def side(event_type: str) -> DataFrame:
        return (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            .where(F.col("event_type") == event_type)
        )

    joined = interval_join_views_purchases(side("view"), side("purchase"))
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        with tempfile.TemporaryDirectory(dir=ckpt_base) as ckpt:
            q = (
                joined.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    rows = spark.table(name).collect()
    return spark.createDataFrame(rows, joined.schema)
