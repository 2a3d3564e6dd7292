"""Incremental ingest-rate anomaly monitoring over an event stream —
the continuous counterpart of the batch ``rolling_anomaly_hours``
query, built on an ADDITIVE hourly-count index (the
streaming/sketch.py counter discipline, not the dedup indexes'
membership discipline).

Each micro-batch contributes a delta of exact per-(event_type, hour)
counts, written as a versioned ``v{batch_id}`` parquet directory with
a ``_SUCCESS`` commit point:

- exactly-once under crash replay: a re-run batch overwrites its OWN
  version (idempotent); a partial version without ``_SUCCESS`` is
  invisible;
- the merged state is a pure SUM over deltas — counts are algebraic,
  so after replaying a corpus in ANY split order the merged hourly
  counts equal the batch aggregation exactly, and the detector output
  equals the batch query exactly (``tests/test_streaming_anomaly.py``
  asserts row-set equality).  No arrival-order caveat at all — the
  strongest stream==batch contract in the streaming package, because
  counter addition commutes where dedup membership does not;
- ``compact_counts`` folds all versions into one (sums are lossless),
  reusing v{max} with the shared ``_COMPACTED`` marker so a replayed
  pre-compaction batch skips its writes.

The detector itself is ``queries_catalog.rolling_zscore_anomalies``
— the SAME function the batch query runs, applied to the merged
counts — so stream and batch can never drift: the contract is the
counts' additivity plus one shared detector.

Scale shape: per-batch state written is O(types x hours touched by
the batch); the merged read is O(types x hours) total — the corpus
never re-scans.  At 100 TB/day ingest the index is the tiny
aggregate, exactly the bounded-state argument of the CMS index.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.streaming.neardup import (
    COMPACTED_MARKER,
    recover_compaction,
    replay_hits_compacted,
)
from flink_repartition_watermark_example_spark.streaming.sketch import _versions


def hourly_count_writer(index_path: str, *, ts_col: str = "ts",
                        key_col: str = "event_type"):
    """foreachBatch body: write the batch's exact (key, hour, n)
    count delta as ``v{batch_id}``.  Keyword-required columns (the
    streaming/sketch.py key_col lesson): a caller counting a
    different stream must say so explicitly."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        recover_compaction(index_path)
        if replay_hits_compacted(index_path, batch_id):
            return  # delta already folded into the compacted snapshot
        # Aggregate first, then ONE job: write the delta to a tmp dir
        # and publish via footer-count + rename (r13 — see
        # int8scale._publish_delta_if_nonempty; the previous
        # persist + isEmpty probe + write was two jobs per batch).
        from flink_repartition_watermark_example_spark.streaming.int8scale import (
            _publish_delta_if_nonempty,
        )

        delta = batch_df.groupBy(
            F.col(key_col).alias("event_type"),
            F.date_trunc("hour", ts_col).alias("h"),
        ).agg(F.count(F.lit(1)).alias("n"))
        _publish_delta_if_nonempty(delta, index_path, int(batch_id))

    return write


def read_hourly_counts(spark: SparkSession, index_path: str) -> DataFrame:
    """The merged counts: SUM of all committed deltas per (type,
    hour) — equals the batch aggregation over everything the
    committed versions saw, in any arrival order."""
    vs = _versions(index_path)
    if not vs:
        return spark.createDataFrame(
            [], "event_type string, h timestamp, n bigint"
        )
    parts = [
        spark.read.parquet(os.path.join(index_path, f"v{v}")) for v in vs
    ]
    return (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy("event_type", "h")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def detect_anomalies(spark: SparkSession, index_path: str) -> DataFrame:
    """Run the SHARED batch detector over the merged index — the
    monitoring readout a pipeline queries after (or between)
    micro-batches."""
    from flink_repartition_watermark_example_spark.queries_catalog import rolling_zscore_anomalies

    return rolling_zscore_anomalies(read_hourly_counts(spark, index_path))


def compact_counts(spark: SparkSession, index_path: str) -> int:
    """Fold every committed version into one (counter sums are
    lossless); reuses v{max} via the shared staged-rename discipline.
    Returns the number of versions removed."""
    import shutil

    recover_compaction(index_path)
    vs = _versions(index_path)
    if len(vs) <= 1:
        return 0
    merged = read_hourly_counts(spark, index_path)
    tmp = os.path.join(index_path, f"_compact_tmp_v{vs[-1]}")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    open(os.path.join(tmp, COMPACTED_MARKER), "w").close()
    for v in vs:
        shutil.rmtree(os.path.join(index_path, f"v{v}"))
    os.rename(tmp, os.path.join(index_path, f"v{vs[-1]}"))
    return len(vs) - 1
