"""The reference experiment, automated (SURVEY §5.2 'streaming replay
test'): two event-time-skewed sources, union, min-of-sources watermark,
keyed hourly windowed count, append emission.

Asserts the three invariants of reference README.md:49-58:
1. conservation — Σ emitted window counts == #input events, every
   window emitted exactly once;
2. no premature fire — a window emitted in batch N has window_end <=
   the min source watermark reached after batch N-1's data (we check
   the weaker, order-robust form: window_end <= final watermark, and
   windows whose end exceeds the slow source's progress at batch k are
   not emitted in batches <= k);
3. stream == batch — the union of all emitted rows equals the plain
   batch groupBy over the same inputs.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.sources.generator import pageviews
from flink_repartition_watermark_example_spark.streaming.replica import (
    run_skew_experiment,
    windowed_count_stream,
    write_close_sentinel,
)

pytestmark = pytest.mark.slow  # streaming replays: minute-class


def _utc(*a):
    return datetime(*a, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def skew_dirs(spark, tmp_path_factory):
    """Scaled-down skew fixture (FIXTURES.md §A): 2 partitions × 6 h of
    events at 1 event/4s, skewed by 3 h; each partition written as
    several files in event-time order so the file stream replays it
    across micro-batches."""
    base = tmp_path_factory.mktemp("skew")
    intervals = [
        (_utc(2016, 2, 1, 0), _utc(2016, 2, 1, 6)),
        (_utc(2016, 2, 1, 3), _utc(2016, 2, 1, 9)),
    ]
    dirs = []
    for i, (s, e) in enumerate(intervals):
        df = pageviews(spark, s, e, millis_between_events=4000, seed=42 + i)
        d = str(base / f"part{i}")
        # One file per event-time hour, written in order → the stream
        # consumes hour k of both partitions in batch k.
        chunks = df.withColumn("h", F.hour("ts")).persist()
        for j, h in enumerate(sorted(r.h for r in chunks.select("h").distinct().collect())):
            chunks.where(F.col("h") == h).drop("h").coalesce(1).write.mode(
                "append"
            ).parquet(d)
        chunks.unpersist()
        write_close_sentinel(spark, d)
        dirs.append(d)
    return dirs


@pytest.fixture(scope="module")
def replay(spark, skew_dirs):
    return run_skew_experiment(spark, skew_dirs, files_per_trigger=1)


def test_conservation_and_single_fire(replay):
    # 2 partitions × 6h × 900 events/h
    rows = replay.emitted_rows
    assert sum(r.aggregate for r in rows) == 2 * 6 * 900
    keys = [(r.window_start, r.url) for r in rows]
    assert len(keys) == len(set(keys)), "a window fired more than once"


def test_stream_equals_batch(spark, skew_dirs, replay):
    batch = (
        windowed_count_stream([spark.read.parquet(d) for d in skew_dirs])
        .collect()
    )
    assert sorted(map(tuple, replay.emitted_rows)) == sorted(map(tuple, batch))


def test_no_premature_fire(replay):
    """Min-of-sources semantics: the slow source starts 3 h behind, so
    no window may fire before both sources' data for it is complete.
    Overlap-region windows (3h-6h) must not be emitted while only the
    fast source has delivered them — i.e. every emitted window's end
    precedes the watermark reached by the *end of the previous batch*
    (Spark advances the watermark to min over sources after each batch).
    """
    assert len(replay.batches) > 1, "replay collapsed into one batch"
    # Reconstruct watermark-by-batch from progress; windows emitted in
    # batch b must satisfy end <= watermark(after batches < b)... Spark
    # emits when watermark >= end, with watermark from previous batch.
    wm = dict(replay.watermarks)
    for batch_id, rows in replay.batches:
        if not rows:
            continue
        prior = [w for b, w in wm.items() if b <= batch_id]
        assert prior, f"batch {batch_id} emitted rows before any watermark"
        max_wm = max(prior)
        for r in rows:
            assert r.window_end.isoformat() <= max_wm.replace("Z", ""), (
                f"window {r.window_start}..{r.window_end} fired before "
                f"watermark {max_wm} (batch {batch_id})"
            )


def test_state_store_is_rocksdb(spark):
    """SURVEY §7.4: streaming state must live in RocksDB (disk-bounded)
    rather than the in-heap HDFSBackedStateStore map."""
    assert "RocksDBStateStoreProvider" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )


def test_checkpoint_restart_does_not_reemit(spark, skew_dirs, tmp_path):
    """S10 exactly-once across restarts: draining the same inputs a
    second time from the same checkpoint must emit nothing new — the
    WAL/state commit, not the sink, is the source of truth."""
    schema = spark.read.parquet(skew_dirs[0]).schema
    ckpt = str(tmp_path / "ckpt")

    def run() -> int:
        sources = [
            spark.readStream.schema(schema).parquet(d) for d in skew_dirs
        ]
        out = windowed_count_stream(sources)
        emitted = []
        q = (
            out.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: emitted.append(df.count()))
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        return sum(emitted)

    first = run()
    assert first > 0
    assert run() == 0, "restart from checkpoint re-emitted rows"


def test_late_row_into_evicted_window_is_dropped(spark, tmp_path):
    """The finality half of S10: once the watermark passes a window and
    it fires, later rows for that window are discarded — the window is
    NEVER emitted twice (Spark's drop of too-late data is best-effort
    while a window's state is still open, but eviction makes firing
    final; append mode may not retract).

    Replay: 6 rows in [10:00,11:00), a 12:30 row that advances the
    watermark to 11:30 (1 h delay), a 13:00 batch during which [10,11)
    fires and evicts, then a 10:07 straggler that must vanish."""
    d = str(tmp_path / "late")
    files = [
        [("u", f"2016-02-01 10:{m:02d}:00") for m in range(0, 60, 10)],
        [("u", "2016-02-01 12:30:00")],
        [("u", "2016-02-01 13:00:00")],
        [("u", "2016-02-01 10:07:00"), ("u", "2016-02-01 14:00:00")],
    ]
    for rows in files:
        spark.createDataFrame(rows, ["url", "s"]).select(
            "url", F.col("s").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(d)
    write_close_sentinel(spark, d)
    schema = spark.read.parquet(d).schema
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    out = windowed_count_stream([src], watermark_delay="1 hour")
    emitted = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: emitted.extend(df.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    fired = [(r.window_start.hour, r.aggregate) for r in emitted]
    assert sorted(fired) == [(10, 6), (12, 1), (13, 1), (14, 1)], fired
    # exactly-once: no window key appears twice
    assert len({h for h, _ in fired}) == len(fired)


def test_late_row_within_watermark_delay_is_included(spark, tmp_path):
    """Bounded lateness (the engine-side generalization the reference's
    delay-0 assigner doesn't need, Flink-next's allowedLateness): a
    straggler older than the max event time seen but still above the
    delayed watermark must be counted into its still-open window.

    Replay (delay 1 h): 6 rows in [10:00,11:00), an 11:30 row pushing
    the watermark to only 10:30 (window still open), a 10:55 straggler
    → included; a 13:00 row then fires [10,11) with SEVEN rows."""
    d = str(tmp_path / "bounded_late")
    files = [
        [("u", f"2016-02-01 10:{m:02d}:00") for m in range(0, 60, 10)],
        [("u", "2016-02-01 11:30:00")],
        [("u", "2016-02-01 10:55:00")],  # late, but watermark is 10:30
        [("u", "2016-02-01 13:00:00")],
    ]
    for rows in files:
        spark.createDataFrame(rows, ["url", "s"]).select(
            "url", F.col("s").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(d)
    write_close_sentinel(spark, d)
    schema = spark.read.parquet(d).schema
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    out = windowed_count_stream([src], watermark_delay="1 hour")
    emitted = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: emitted.extend(df.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    fired = sorted((r.window_start.hour, r.aggregate) for r in emitted)
    assert fired == [(10, 7), (11, 1), (13, 1)], fired


def test_batched_replay_fpt_equals_batch(spark, sf_dir, monkeypatch):
    """SPARK_GRAFT_STREAM_FPT > 1 (the sf100 sweep's batching knob —
    k files per micro-batch instead of one) must not change the
    emitted window SET: the replay dir pads k copies of the first
    close sentinel so a batch boundary always separates the two
    sentinels, and the final windows still flush.  Full-row equality
    vs the batch GROUP BY, exactly the driver-gate contract."""
    from flink_repartition_watermark_example_spark.queries import QUERIES

    monkeypatch.setenv("SPARK_GRAFT_STREAM_FPT", "4")
    stream = QUERIES["streaming_windowed_count"].spark(spark, sf_dir)
    batch = QUERIES["windowed_count"].spark(spark, sf_dir)
    got = sorted(map(tuple, stream.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got and got == want
