"""Skewed-key streaming aggregation (VERDICT round-2 action #7): the
two-stage salted windowed count must equal the plain batch GROUP BY on
a hot-key distribution, emit each window exactly once, and spread the
hot key across salt buckets in stage 1."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.sources.generator import pageviews
from flink_repartition_watermark_example_spark.streaming.replica import (
    salted_windowed_count_stream,
    write_close_sentinel,
)

pytestmark = pytest.mark.slow  # streaming replays: minute-class

HOT = "http://site.com/hot"


def _utc(*a):
    return datetime(*a, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory):
    """4 hours of events at 1/2s, ~90% of them on one hot url."""
    base = tmp_path_factory.mktemp("hotkey")
    df = pageviews(
        spark, _utc(2016, 2, 1, 0), _utc(2016, 2, 1, 4), millis_between_events=2000
    ).withColumn(
        "url",
        F.when(
            F.pmod(F.xxhash64(F.col("event_id")), F.lit(10)) < 9, F.lit(HOT)
        ).otherwise(F.col("url")),
    )
    d = str(base / "part0")
    # one file per hour, in event-time order (file stream replays by
    # mtime), then the close sentinels
    for h in range(4):
        df.where(F.hour("ts") == h).coalesce(1).write.mode("append").parquet(d)
    write_close_sentinel(spark, d)
    return d


def _drain(spark, out, ckpt: str):
    import uuid

    name = "salted_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_salted_stream_equals_batch_on_hot_keys(spark, hot_dir, tmp_path):
    schema = spark.read.parquet(hot_dir).schema
    stream = [
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(hot_dir)
    ]
    got = _drain(
        spark, salted_windowed_count_stream(stream), str(tmp_path / "ck")
    ).collect()

    # exactly-once per (window, key)
    keys = [(r.window_start, r.url) for r in got]
    assert len(keys) == len(set(keys))

    batch = (
        spark.read.parquet(hot_dir)
        .where(F.col("url") != "__source_closed__")
        .groupBy(F.window("ts", "1 hour"), "url")
        .agg(F.count(F.lit(1)).alias("aggregate"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "url",
            "aggregate",
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))

    # the distribution really is hot-keyed (the premise of the test)
    by_url = {}
    for r in got:
        by_url[r.url] = by_url.get(r.url, 0) + r.aggregate
    assert by_url[HOT] / sum(by_url.values()) > 0.8


def test_stage1_spreads_hot_key_state(spark, hot_dir):
    """The salted partial really partitions the hot key: at least half
    of the salt buckets carry stage-1 groups for it (batch-mode check
    of the same expressions — withWatermark is a no-op in batch)."""
    df = spark.read.parquet(hot_dir).where(F.col("url") == HOT)
    buckets = (
        df.withColumn(
            "__salt", F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(8))
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert buckets >= 4
