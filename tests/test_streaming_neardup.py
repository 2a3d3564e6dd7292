"""Incremental LSH near-dup index (streaming/neardup.py): streaming
the corpus in arbitrary batch splits must yield exactly the batch
pipeline's candidate pairs, and crash-replayed batches must be
idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators.dedup import lsh_candidate_pairs
from flink_repartition_watermark_example_spark.sources.tables import load_table
from flink_repartition_watermark_example_spark.streaming.neardup import (
    neardup_index_writer,
    read_neardup_pairs,
)


def _pair_map(df):
    return {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in df.collect()
    }


def test_incremental_index_equals_batch_pairs(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    src = str(tmp_path / "docs_stream")
    # three arrival batches, split by doc_id
    for i, cond in enumerate(
        [
            F.col("doc_id") % 3 == 0,
            F.col("doc_id") % 3 == 1,
            F.col("doc_id") % 3 == 2,
        ]
    ):
        docs.where(cond).coalesce(1).write.mode("append").parquet(src)

    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.outputMode("append")
        .foreachBatch(neardup_index_writer(index, pairs))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _pair_map(read_neardup_pairs(spark, pairs))
    want = _pair_map(
        lsh_candidate_pairs(docs, max_bucket_docs=10**9)
    )
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k
    assert len(got) > 0  # the corpus genuinely contains near-dups


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first = docs.where(F.col("doc_id") % 2 == 0)
    second = docs.where(F.col("doc_id") % 2 == 1)

    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    w = neardup_index_writer(index, pairs)
    w(first, 0)
    w(second, 1)
    once = _pair_map(read_neardup_pairs(spark, pairs))

    w(second, 1)  # crash replay of batch 1
    assert _pair_map(read_neardup_pairs(spark, pairs)) == once
    # index holds every doc exactly once per band
    n_docs = docs.count()
    idx = spark.read.parquet(
        os.path.join(index, "v0"), os.path.join(index, "v1")
    )
    assert idx.select("doc_id").distinct().count() == n_docs
