"""Incremental span-level exact dedup over a document stream — the
continuous counterpart of the batch ``span_dedup_stats`` /
``span_dedup_docs`` pair (queries_pipeline.py), completing the
streaming story for every dedup grain the engine ships: document
(streaming/dedup.py), near-dup (streaming/neardup.py), semantic
(streaming/semdedup.py), and now sub-document span.

Per micro-batch (foreachBatch, the versioned-directory device shared
with the CDC MERGE sink and the other streaming indexes):

1. the batch's documents are cut into disjoint SPAN_SIZE-token
   segments keyed by md5 — the SAME pure scan-side projection as the
   batch operator (queries_pipeline.span_segments), so stream and
   batch can never disagree on segmentation;
2. a segment is KEPT when its seg_key has never been seen — not in
   the persisted index (equi-join on (bucket, seg_key)) and not
   earlier in this batch (rank-1 by (doc_id, chunk_id) per seg_key);
3. each arriving doc is re-emitted as its deduplicated rewrite
   (kept segments re-joined in original order — exactly the
   span_dedup_docs contract; a doc whose every segment was already
   seen disappears), and the batch's FRESH seg_keys merge into the
   index.

Exactly-once under crash replay: each batch writes its own
``v{batch_id}`` delta of the index and its own docs partition, so a
replayed batch overwrites itself instead of duplicating.  The docs
output publishes BEFORE the index delta (the pairs-before-index
ordering of streaming/neardup.py): a folded index delta therefore
always implies committed docs, so compaction while the stream is down
can never strand a batch's output.

Scale shape: the index is partitioned by ``bucket = crc32(seg_key)
mod SPAN_INDEX_BUCKETS`` and the new-vs-index anti-join carries
bucket in its keys, so the lookup prunes to the partitions the new
segments hash into; per-batch cost is O(new segments ×
touched-bucket sizes), independent of corpus age.  seg_key itself is
near-unique (a 128-bit md5) — one directory per key would be a
small-files explosion, so the mod-bucket is the partition key, the
exact device of streaming/neardup.py's INDEX_BUCKETS.  State is the
parquet index — disk-bounded, restart-safe — never executor memory.

Equivalence contract (tested): streaming the corpus in
doc_id-ordered splits yields exactly the batch ``span_dedup_docs``
rewrite over the full corpus, because the batch rule keeps the
minimal (doc_id, chunk_id) occurrence per seg_key and ordered
arrival indexes precisely the lower-id occurrences first.  With
UNORDERED splits the rule is emission-time (the shared discipline of
every streaming index here): a segment emitted as kept is not
retroactively withdrawn when a lower-id twin arrives later; the late
twin is dropped instead.  A batch re-run over the final corpus
reconciles when exact batch semantics are required.

Reference anchor: Main.scala:24-25 keyed-state discipline — per-key
work stays bounded per key; here the "key" is the segment hash and
each key enters the index exactly once, so the index grows with the
DISTINCT span count, not the corpus size.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.streaming.neardup import (
    COMPACTED_MARKER,
    _versions,
    recover_compaction,
    replay_hits_compacted,
)

# Partition fanout per index version — coarse enough to avoid a
# small-files problem, fine enough that a batch touching few buckets
# prunes most of the index at the anti-join.
SPAN_INDEX_BUCKETS = 64


def _bucket(col: str) -> Column:
    return F.pmod(F.crc32(F.col(col)), F.lit(SPAN_INDEX_BUCKETS)).cast("int")


def _read_index(spark: SparkSession, index_path: str, below: int) -> DataFrame | None:
    vs = [v for v in _versions(index_path) if v < below]
    if not vs:
        return None
    # One partition-discovering read per version, then unionByName
    # (several partitioned roots in one read would mis-infer the
    # v{n} dirs as partition values — the neardup lesson).
    parts = [
        spark.read.parquet(os.path.join(index_path, f"v{v}")) for v in vs
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def spandedup_index_writer(index_path: str, docs_path: str):
    """foreachBatch body: maintain the seg_key index and emit each
    arriving batch's span-deduplicated document rewrites
    (doc_id, dedup_text, n_kept_segs — the span_dedup_docs schema).
    """
    from pyspark.sql.window import Window

    from flink_repartition_watermark_example_spark.queries_pipeline import span_segments

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        recover_compaction(index_path)
        if replay_hits_compacted(index_path, bid):
            return  # this batch's keys are already in the snapshot
        if batch_df.isEmpty():
            # Empty micro-batch (idle tick / empty replay) must be a
            # no-op — a partitionBy write with no data files would
            # make the next _read_index die on UNABLE_TO_INFER_SCHEMA
            # in a crash loop (the streaming/semdedup.py lesson).
            return

        segs = span_segments(batch_df).withColumn(
            "bucket", _bucket("seg_key")
        )
        w = Window.partitionBy("seg_key").orderBy("doc_id", "chunk_id")
        firsts = segs.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") == 1
        )
        old = _read_index(spark, index_path, below=bid)
        if old is not None:
            # (bucket, seg_key) in the join keys lines up with the
            # index partitioning so the scan prunes to the buckets
            # this batch touches.
            firsts = firsts.join(
                old.select("bucket", "seg_key"),
                ["bucket", "seg_key"],
                "left_anti",
            )
        # `firsts` feeds three actions (docs write, emptiness probe,
        # index delta) — persist so the window + anti-join run once.
        kept = firsts.select(
            "bucket", "seg_key", "doc_id", "chunk_id", "chunk_text"
        ).persist()
        try:
            docs_out = kept.groupBy("doc_id").agg(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("chunk_id", "chunk_text"))
                        ),
                        lambda s: s["chunk_text"],
                    ),
                    " ",
                ).alias("dedup_text"),
                F.count(F.lit(1)).cast("long").alias("n_kept_segs"),
            )
            # docs publish FIRST (see module docstring) — an empty
            # rewrite (every span already seen) still writes a
            # readable empty parquet, unlike the partitioned index.
            docs_out.write.mode("overwrite").parquet(
                os.path.join(docs_path, f"v{bid}")
            )
            if not kept.isEmpty():
                kept.select("bucket", "seg_key", "doc_id", "chunk_id").write.mode(
                    "overwrite"
                ).partitionBy("bucket").parquet(
                    os.path.join(index_path, f"v{bid}")
                )
            # an all-duplicates batch publishes NO index version: it
            # contributed no fresh keys, and _versions skipping bid is
            # exactly the right recovery semantics on replay.
        finally:
            kept.unpersist()

    return write


def read_spandedup_docs(spark: SparkSession, docs_path: str) -> DataFrame:
    """All document rewrites emitted so far (union of committed batch
    outputs) — one row per surviving doc, the span_dedup_docs schema."""
    vs = _versions(docs_path)
    if not vs:
        raise FileNotFoundError(f"no committed docs under {docs_path}")
    return spark.read.parquet(
        *[os.path.join(docs_path, f"v{v}") for v in vs]
    )


def compact_index(spark: SparkSession, index_path: str) -> int:
    """Fold all committed index versions into a single v{max}
    partitioned snapshot and drop the olders — bounds the
    versions-per-read cost for long-running streams.  Keys enter the
    index exactly once (fresh-only deltas), so the fold is a pure
    union.  Crash-recoverable via recover_compaction (the staged dir
    name carries the target id); not atomic against a CONCURRENT
    writer — run from the maintenance path."""
    import shutil

    recover_compaction(index_path)
    vs = _versions(index_path)
    if len(vs) <= 1:
        return vs[0] if vs else -1
    merged = _read_index(spark, index_path, below=vs[-1] + 1)
    tmp = os.path.join(index_path, f"_compact_tmp_v{vs[-1]}")
    merged.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    open(os.path.join(tmp, COMPACTED_MARKER), "w").close()
    for v in vs:
        shutil.rmtree(os.path.join(index_path, f"v{v}"))
    os.rename(tmp, os.path.join(index_path, f"v{vs[-1]}"))
    return vs[-1]
