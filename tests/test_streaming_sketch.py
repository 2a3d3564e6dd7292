"""Incremental count-min sketch (streaming/sketch.py): streamed in any
batch split, the merged sketch must equal the batch sketch EXACTLY
(counters are algebraic), crash replays must be idempotent, and
compaction must be lossless."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from flink_repartition_watermark_example_spark.operators.sketch import cms_build
from flink_repartition_watermark_example_spark.sources.tables import load_table
from flink_repartition_watermark_example_spark.streaming.sketch import (
    cms_sketch_writer,
    compact_sketch,
    estimate_from_sketch,
    read_cms_sketch,
)

pytestmark = pytest.mark.slow  # streaming replay: minute-class


def _cells(df):
    return {(r["depth"], r["cell"]): r["n"] for r in df.collect()}


def test_streamed_sketch_equals_batch_sketch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select("event_id", "url")

    src = str(tmp_path / "events_stream")
    for cond in (
        F.col("event_id") % 3 == 0,
        F.col("event_id") % 3 == 1,
        F.col("event_id") % 3 == 2,
    ):
        events.where(cond).coalesce(1).write.mode("append").parquet(src)

    sketch = str(tmp_path / "sketch")
    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.outputMode("append")
        .foreachBatch(cms_sketch_writer(sketch, key_col="url"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _cells(read_cms_sketch(spark, sketch))
    want = _cells(cms_build(events, F.col("url")))
    assert got == want and len(got) > 0

    # estimates over the maintained sketch are the batch estimates
    keys = events.select("url").distinct().limit(5)
    est = {
        r["url"]: r["est"]
        for r in estimate_from_sketch(
            spark, sketch, keys, F.col("url")
        ).collect()
    }
    truth = {
        r["url"]: r["n"]
        for r in events.join(keys, "url", "left_semi")
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for url, n in truth.items():
        assert est[url] >= n  # CMS never underestimates

    # compaction is lossless
    removed = compact_sketch(spark, sketch)
    assert removed == 3
    assert _cells(read_cms_sketch(spark, sketch)) == want


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select("event_id", "url")
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)

    sketch = str(tmp_path / "sketch")
    w = cms_sketch_writer(sketch, key_col="url")
    w(first, 0)
    w(second, 1)
    once = _cells(read_cms_sketch(spark, sketch))

    w(second, 1)  # crash replay of batch 1
    assert _cells(read_cms_sketch(spark, sketch)) == once
