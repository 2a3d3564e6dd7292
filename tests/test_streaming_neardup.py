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

import pytest

pytestmark = pytest.mark.slow  # streaming replays: minute-class


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
        .foreachBatch(neardup_index_writer(index, pairs, max_bucket_docs=None))
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
    # index holds every doc exactly once per band (partition-
    # discovering read per version: each v{n} is partitioned storage)
    n_docs = docs.count()
    idx = spark.read.parquet(os.path.join(index, "v0")).unionByName(
        spark.read.parquet(os.path.join(index, "v1"))
    )
    assert idx.select("doc_id").distinct().count() == n_docs


def test_index_is_partitioned_and_hot_buckets_capped(spark, tmp_path):
    """Scale contract of the incremental index: (1) each version is
    laid out band=/bucket= on disk so the new-vs-index join can prune
    to touched buckets; (2) a degenerate bucket — here near-identical
    one-word docs that all hash together — is excluded from candidate
    generation once its population crosses the cap, exactly like the
    batch twins, instead of going quadratic per batch."""
    from flink_repartition_watermark_example_spark.streaming.neardup import (
        compact_index,
    )

    # 120 docs with identical text → every band bucket is one hot
    # bucket of 120; 3 distinct docs that pair only with themselves.
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(120)]
    # 200/201 identical → all four bands collide (deterministic pair,
    # bucket of 2 stays under the cap); 202 pairs with nothing.
    rows += [
        (200, "one two three four five six"),
        (201, "one two three four five six"),
        (202, "totally different words here entirely now"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    w = neardup_index_writer(index, pairs, max_bucket_docs=64)
    w(docs.where(F.col("doc_id") < 60), 0)  # below cap: pairs allowed
    w(docs.where(F.col("doc_id") >= 60), 1)  # pushes population past cap

    # layout: band=/bucket= directories under each version
    v1 = os.path.join(index, "v1")
    bands = [d for d in os.listdir(v1) if d.startswith("band=")]
    assert bands, f"index not partitioned by band: {os.listdir(v1)}"
    buckets = [
        d
        for d in os.listdir(os.path.join(v1, bands[0]))
        if d.startswith("bucket=")
    ]
    assert buckets, "index not partitioned by bucket"

    got = {
        (r["doc_a"], r["doc_b"])
        for r in read_neardup_pairs(spark, pairs).collect()
    }
    # batch 0 emitted sub-cap identical-doc pairs (≤ 60*59/2); batch 1
    # must emit NO pairs among the hot identical docs — only the small
    # legit pair — so the total stays far below the uncapped 120*119/2.
    hot_pairs_batch1 = {
        (a, b) for a, b in got if a < 120 and b < 120 and (a >= 60 or b >= 60)
    }
    assert not hot_pairs_batch1, (
        f"hot bucket not capped: {len(hot_pairs_batch1)} pairs emitted"
    )
    assert (200, 201) in got  # legit near-dup still found

    # compaction folds versions into one partitioned snapshot
    v = compact_index(spark, index)
    assert v == 1 and os.path.isdir(os.path.join(index, "v1"))
    assert not os.path.isdir(os.path.join(index, "v0"))
    idx = spark.read.parquet(os.path.join(index, "v1"))
    assert idx.select("doc_id").distinct().count() == 123
