"""Incremental anomaly index (streaming/anomaly.py): counts are
additive, so replaying the events table in ANY split order must make
the detector output exactly the batch rolling_anomaly_hours rows —
no arrival-order caveat; plus the shared replay-idempotence and
compaction contracts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES
from flink_repartition_watermark_example_spark.sources.tables import load_table
from flink_repartition_watermark_example_spark.streaming.anomaly import (
    compact_counts,
    detect_anomalies,
    hourly_count_writer,
    read_hourly_counts,
)

pytestmark = pytest.mark.slow  # streaming replays: minute-class


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _batch_rows(spark, sf_dir):
    return _rows(EXTRA_QUERIES["rolling_anomaly_hours"].spark(spark, sf_dir))


def test_streamed_unordered_splits_equal_batch_detector(spark, sf_dir, tmp_path):
    """Deliberately NON-time-ordered splits (split by user_id % 3, so
    every hour's events are scattered across all three batches): the
    additive index must still converge to the batch counts, and the
    shared detector to the batch anomaly rows."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "user_id")

    src = str(tmp_path / "ev_stream")
    for k in range(3):
        ev.where(F.pmod(F.col("user_id"), F.lit(3)) == k).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    index = str(tmp_path / "index")
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.outputMode("append")
        .foreachBatch(hourly_count_writer(index))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # merged counts equal the batch aggregation exactly
    want_counts = _rows(
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    assert _rows(read_hourly_counts(spark, index)) == want_counts

    got = _rows(detect_anomalies(spark, index))
    assert got == _batch_rows(spark, sf_dir)
    assert got  # the detector genuinely fires on this corpus


def test_replayed_batch_and_compaction_are_lossless(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "user_id")
    n = ev.count()
    a = ev.where(F.pmod(F.col("user_id"), F.lit(2)) == 0)
    b = ev.where(F.pmod(F.col("user_id"), F.lit(2)) == 1)

    index = str(tmp_path / "index")
    w = hourly_count_writer(index)
    w(a, 0)
    w(b, 1)
    once = _rows(detect_anomalies(spark, index))
    assert once == _batch_rows(spark, sf_dir)

    w(b, 1)  # crash replay overwrites its own delta — no double count
    assert _rows(detect_anomalies(spark, index)) == once

    removed = compact_counts(spark, index)
    assert removed == 1
    assert _rows(detect_anomalies(spark, index)) == once

    w(b, 1)  # replay of the last pre-compaction batch: marker skip
    assert _rows(detect_anomalies(spark, index)) == once

    # a resumed stream keeps accumulating after compaction: replaying
    # half the corpus again as batch 2 doubles those hours' counts
    w(b, 2)
    doubled = read_hourly_counts(spark, index).agg(F.sum("n")).collect()[0][0]
    assert doubled == n + b.count()


def test_empty_micro_batch_publishes_nothing(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "user_id")
    index = str(tmp_path / "index")
    w = hourly_count_writer(index)
    w(ev.where(F.lit(False)), 0)
    assert not os.path.isdir(os.path.join(index, "v0"))
    w(ev, 1)
    assert _rows(detect_anomalies(spark, index)) == _batch_rows(spark, sf_dir)
