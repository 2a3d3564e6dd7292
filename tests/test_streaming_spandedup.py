"""Incremental span-dedup index (streaming/spandedup.py): streaming
the documents table in doc_id-ordered splits must yield exactly the
batch span_dedup_docs rewrite; crash-replayed batches must be
idempotent; an all-duplicates batch (zero fresh keys) must be safe;
compaction must be lossless against resumed streams."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES, QUERIES
from flink_repartition_watermark_example_spark.sources.tables import load_table
from flink_repartition_watermark_example_spark.streaming.spandedup import (
    compact_index,
    read_spandedup_docs,
    spandedup_index_writer,
)

pytestmark = pytest.mark.slow  # streaming replays: minute-class


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )


def _rewrite_set(df):
    return {
        (r["doc_id"], r["dedup_text"], r["n_kept_segs"]) for r in df.collect()
    }


def _batch_rewrite(spark, sf_dir):
    return EXTRA_QUERIES["span_dedup_docs"].spark(spark, sf_dir)


def test_streamed_ordered_splits_equal_batch_rewrite(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    n = docs.count()
    cuts = [n // 3, 2 * n // 3]

    src = str(tmp_path / "doc_stream")
    # three id-ordered arrival batches (files written in id order so
    # the mtime-ordered file stream replays them in order)
    for cond in [
        F.col("doc_id") < cuts[0],
        (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1]),
        F.col("doc_id") >= cuts[1],
    ]:
        docs.where(cond).coalesce(1).write.mode("append").parquet(src)

    index = str(tmp_path / "index")
    out = str(tmp_path / "docs_out")
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.outputMode("append")
        .foreachBatch(spandedup_index_writer(index, out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _rewrite_set(read_spandedup_docs(spark, out))
    want = _rewrite_set(_batch_rewrite(spark, sf_dir))
    assert got == want
    # the dedup genuinely acts: some segment was dropped somewhere
    total_kept = sum(k for _, _, k in got)
    total_segs = sum(
        r["n_segs"]
        for r in QUERIES["span_dedup_stats"].spark(spark, sf_dir).collect()
    )
    assert 0 < total_kept < total_segs


def test_replayed_batch_is_idempotent_and_compaction_lossless(
    spark, sf_dir, tmp_path
):
    docs = _docs(spark, sf_dir)
    n = docs.count()
    first = docs.where(F.col("doc_id") < n // 2)
    second = docs.where(F.col("doc_id") >= n // 2)

    index = str(tmp_path / "index")
    out = str(tmp_path / "docs_out")
    w = spandedup_index_writer(index, out)
    w(first, 0)
    w(second, 1)
    once = _rewrite_set(read_spandedup_docs(spark, out))
    assert once == _rewrite_set(_batch_rewrite(spark, sf_dir))

    w(second, 1)  # crash replay of batch 1 overwrites itself
    assert _rewrite_set(read_spandedup_docs(spark, out)) == once

    # compaction folds the index to one version; a RESUMED stream
    # (next batch_id == 2 > surviving version id) sees the same state:
    # re-sending batch 1's docs as batch 2 finds every seg_key already
    # indexed, so those docs vanish from batch 2's rewrite and no
    # fresh index version is published.
    kept = compact_index(spark, index)
    assert kept == 1
    w(second, 2)
    assert not os.path.isdir(os.path.join(index, "v2"))
    after = read_spandedup_docs(spark, out)
    # batch 2's partition exists but is empty — the union equals `once`
    assert _rewrite_set(after) == once


def test_all_duplicates_batch_publishes_no_index_version(
    spark, sf_dir, tmp_path
):
    """A batch whose every span was already seen must (a) not crash on
    the empty partitionBy write, (b) publish no index delta, and (c)
    leave the docs union unchanged — the spandedup twin of the
    empty-micro-batch crash loop streaming/semdedup.py fixed."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    half = docs.where(F.col("doc_id") < n // 2)

    index = str(tmp_path / "index")
    out = str(tmp_path / "docs_out")
    w = spandedup_index_writer(index, out)
    w(half, 0)
    once = _rewrite_set(read_spandedup_docs(spark, out))

    w(half, 1)  # same docs again: zero fresh seg_keys
    assert not os.path.isdir(os.path.join(index, "v1"))
    assert _rewrite_set(read_spandedup_docs(spark, out)) == once

    # and the index still works for a later batch
    rest = docs.where(F.col("doc_id") >= n // 2)
    w(rest, 2)
    assert _rewrite_set(read_spandedup_docs(spark, out)) == _rewrite_set(
        _batch_rewrite(spark, sf_dir)
    )


def test_empty_micro_batch_is_a_safe_noop(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    n = docs.count()

    src = str(tmp_path / "doc_stream")
    # batch 1: first half; batch 2: EMPTY; batch 3: second half
    docs.where(F.col("doc_id") < n // 2).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    docs.where(F.lit(False)).coalesce(1).write.mode("append").parquet(src)
    docs.where(F.col("doc_id") >= n // 2).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    index = str(tmp_path / "index")
    out = str(tmp_path / "docs_out")
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.outputMode("append")
        .foreachBatch(spandedup_index_writer(index, out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _rewrite_set(read_spandedup_docs(spark, out))
    assert got == _rewrite_set(_batch_rewrite(spark, sf_dir))


def test_replay_of_last_precompaction_batch_is_skipped(spark, sf_dir, tmp_path):
    """Compaction reuses v{max}; a crash-replay of that same batch id
    must skip its writes (the _COMPACTED marker) — overwriting would
    silently drop every earlier seg_key from the index."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    first = docs.where(F.col("doc_id") < n // 2)
    second = docs.where(F.col("doc_id") >= n // 2)

    index = str(tmp_path / "index")
    out = str(tmp_path / "docs_out")
    w = spandedup_index_writer(index, out)
    w(first, 0)
    w(second, 1)
    once = _rewrite_set(read_spandedup_docs(spark, out))

    assert compact_index(spark, index) == 1
    w(second, 1)  # crash replay of the last pre-compaction batch
    assert _rewrite_set(read_spandedup_docs(spark, out)) == once
    assert once == _rewrite_set(_batch_rewrite(spark, sf_dir))
