"""Incremental DQ monitor (streaming/dqmonitor.py): streamed in any
arrival split, the merged per-hour counters must equal the batch
aggregation EXACTLY (counters are algebraic), crash replays must be
idempotent, compaction must be lossless, and a stream that RESUMES
after compaction must not collide with the snapshot's version id —
the versioned-index contract shared with streaming/sketch.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.sources.tables import load_table
from flink_repartition_watermark_example_spark.streaming.dqmonitor import (
    compact_dq_state,
    dq_monitor_writer,
    read_dq_report,
    read_dq_state,
)

pytestmark = pytest.mark.slow  # streaming replay: minute-class

_COLS = ["event_id", "ts", "event_type", "value", "user_id"]


def _rows(df):
    return {
        r["hour"]: (r["n_events"], r["n_errors"], r["n_outliers"], r["n_null_user"])
        for r in df.collect()
    }


def _batch_truth(events):
    return _rows(
        events.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_errors"),
            F.sum(F.when(F.col("value") > 400.0, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_user"),
        )
    )


def test_streamed_monitor_equals_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select(*_COLS)

    src = str(tmp_path / "events_stream")
    for cond in (
        F.col("event_id") % 3 == 0,
        F.col("event_id") % 3 == 1,
        F.col("event_id") % 3 == 2,
    ):
        events.where(cond).coalesce(1).write.mode("append").parquet(src)

    state = str(tmp_path / "dq_state")
    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.outputMode("append")
        .foreachBatch(dq_monitor_writer(state))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = _batch_truth(events)
    assert _rows(read_dq_state(spark, state)) == want and len(want) > 0

    # the derived report: share is the exact-long division, alert the
    # documented threshold — and at 20% base error rate some hours
    # must alert while others don't (the monitor discriminates)
    rep = read_dq_report(spark, state).collect()
    alerts = {r["error_alert"] for r in rep}
    for r in rep:
        n, e = want[r["hour"]][0], want[r["hour"]][1]
        assert r["error_share"] == e / n
        assert r["error_alert"] == (e / n > 0.25)
    assert alerts == {True, False}

    # compaction is lossless (3 versions -> 1 surviving, 2 removed)
    assert compact_dq_state(spark, state) == 2
    assert _rows(read_dq_state(spark, state)) == want


def test_replayed_batch_is_idempotent_and_resume_after_compaction(
    spark, sf_dir, tmp_path
):
    events = load_table(spark, sf_dir, "events").select(*_COLS)
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)

    state = str(tmp_path / "dq_state")
    w = dq_monitor_writer(state)
    w(first, 0)
    once = _rows(read_dq_state(spark, state))
    w(first, 0)  # crash replay of batch 0
    assert _rows(read_dq_state(spark, state)) == once

    # fold both batches into the compacted snapshot (parked at the
    # LAST batch's version id with the marker), then replay that last
    # batch — the only one the stream's checkpoint can ever replay
    # after a restart: it must be skipped, or its overwrite-mode delta
    # would destroy every pre-compaction count in the snapshot
    w(second, 1)
    want = _batch_truth(events)
    assert compact_dq_state(spark, state) == 1
    w(second, 1)
    assert _rows(read_dq_state(spark, state)) == want
