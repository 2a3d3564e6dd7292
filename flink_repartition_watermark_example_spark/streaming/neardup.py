"""Incremental near-duplicate detection over a document stream —
LSH index maintenance as data arrives, the shape a production dedup
service runs continuously instead of re-scanning the corpus.

Per micro-batch (foreachBatch, like the CDC MERGE sink):

1. the batch's docs get minhash signatures + LSH band hashes
   (operators/dedup.py — identical geometry to the batch pipeline);
2. candidate pairs = new-vs-INDEX (equi-join on (band, bucket,
   band_hash) against the persisted index) plus new-vs-new
   (within-batch self-join) — an arriving doc is checked against
   everything seen WITHOUT rescanning it;
3. confirmed pairs (estimated jaccard ≥ threshold over the signature
   arrays) append to the pairs output, and the batch's signatures and
   bands merge into the index.

Exactly-once under crash replay uses the same versioned-directory
device as sinks.cdc_merge_writer: each batch writes its own
``v{batch_id}`` delta of the index and its own pairs partition, so a
replayed batch overwrites itself instead of duplicating.

Scale shape: each index version is written ``partitionBy("band",
"bucket")`` with bucket = band_hash mod INDEX_BUCKETS, and the
new-vs-index join carries (band, bucket) in its keys — so the lookup
prunes to the partitions the new docs hash into (statically when the
new side is literal-foldable, via dynamic partition pruning when it is
broadcast), and per-batch cost is O(new docs × touched-bucket sizes),
independent of corpus age.  (bucket rather than raw band_hash is the
partition key: band_hash is ~unique per doc, and one directory per
distinct hash would be a small-files explosion — 4×INDEX_BUCKETS
directories per version caps the fanout.)  State is the parquet index
— disk-bounded, restart-safe, shared by any number of readers — not
executor memory.

Degenerate buckets get the SAME cap as every batch twin
(operators/dedup.MAX_BUCKET_DOCS): a (band, band_hash) population —
new docs plus indexed docs — larger than the cap is excluded from
candidate generation for this batch (its docs are still indexed).  An
uncapped hot bucket (near-empty docs all hashing together) would make
the per-batch joins quadratic.  One divergence from the batch
discipline is inherent to streaming and documented here: the cap is
evaluated against the population KNOWN AT EMISSION TIME, so pairs
emitted before a bucket crossed the cap stay in the output, whereas a
batch run over the final corpus would have dropped the whole bucket.

Equivalence contract (tested): with the cap disabled
(max_bucket_docs=None), streaming the corpus in ANY batch split yields
exactly the pairs of the batch ``lsh_candidate_pairs`` (bucket cap
likewise disabled) over the full corpus, because minhash signatures
are per-doc and bucket membership is order-independent.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators.dedup import (
    MAX_BUCKET_DOCS,
    lsh_bands,
    minhash_sig_array,
)

# Partition fanout per index version: 4 bands × this many hash-mod
# buckets.  Coarse enough to avoid a small-files problem, fine enough
# that a batch touching few buckets prunes most of the index.
INDEX_BUCKETS = 64


def _bucket(col):
    return F.pmod(F.col(col), F.lit(INDEX_BUCKETS)).cast("int")


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    return sorted(
        int(n[1:])
        for n in os.listdir(path)
        if n.startswith("v")
        and n[1:].isdigit()
        and os.path.exists(os.path.join(path, n, "_SUCCESS"))
    )


COMPACTED_MARKER = "_COMPACTED"


def replay_hits_compacted(path: str, batch_id: int) -> bool:
    """True when ``v{batch_id}`` is a compacted snapshot rather than
    that batch's own delta — i.e. compaction ran while the stream was
    down and REUSED this id, and the checkpoint never committed the
    batch.  A crash-replay of the batch must then SKIP its writes:
    its delta is already folded into the snapshot, and overwriting
    would silently destroy every pre-compaction delta."""
    return os.path.exists(
        os.path.join(path, f"v{int(batch_id)}", COMPACTED_MARKER)
    )


def recover_compaction(path: str) -> None:
    """Repair a compaction that crashed between its deletes and its
    final rename.  The staging dir name carries the target version id
    (``_compact_tmp_v{N}``); a COMMITTED stage holds the merge of
    every version <= N at staging time, so it supersedes whatever
    subset of them a mid-delete crash left behind — finish the deletes
    and install it.  An uncommitted stage is a dead partial write and
    is removed.  Writers call this at the head of every batch and
    compactors/readers at entry, so state can be transiently absent
    but never silently lost.

    "Committed" is gated on COMPACTED_MARKER, NOT parquet's _SUCCESS:
    every compactor touches the marker immediately after the parquet
    write, and the marker is what :func:`replay_hits_compacted` keys
    on.  Gating on _SUCCESS alone would install a stage that crashed
    between the parquet commit and the marker touch as ``v{N}``
    WITHOUT the marker — a later replay of batch N would then miss the
    compaction check and its overwrite-mode delta write would destroy
    every pre-compaction delta folded into the snapshot (the exact
    loss the marker exists to prevent)."""
    import shutil

    if not os.path.isdir(path):
        return
    for name in os.listdir(path):
        if not name.startswith("_compact_tmp_v"):
            continue
        tmp = os.path.join(path, name)
        n = name.removeprefix("_compact_tmp_v")
        if n.isdigit() and os.path.exists(os.path.join(tmp, COMPACTED_MARKER)):
            for v in _versions(path):
                if v <= int(n):
                    shutil.rmtree(
                        os.path.join(path, f"v{v}"), ignore_errors=True
                    )
            os.rename(tmp, os.path.join(path, f"v{n}"))
        else:
            shutil.rmtree(tmp, ignore_errors=True)


def _read_index(spark: SparkSession, index_path: str, below: int) -> DataFrame | None:
    vs = [v for v in _versions(index_path) if v < below]
    if not vs:
        return None
    # One partition-discovering read per version, then unionByName:
    # passing several partitioned roots to a single read would make
    # Spark hunt for a common base path and mis-infer the v{n} dirs as
    # partition values.
    parts = [
        spark.read.parquet(os.path.join(index_path, f"v{v}")) for v in vs
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def _est_jaccard():
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda e: e,
        )
    )
    return (agree.cast("double") / F.size(F.col("sig_a"))).alias("est_jaccard")


def neardup_index_writer(
    index_path: str,
    pairs_path: str,
    text_col: str = "text",
    threshold: float = 0.0,
    max_bucket_docs: int | None = MAX_BUCKET_DOCS,
):
    """foreachBatch body: maintain the LSH index and emit near-dup
    candidate pairs (doc_a < doc_b, est_jaccard ≥ threshold) for each
    arriving batch of (doc_id, text) rows.

    ``max_bucket_docs``: degenerate-bucket cap over the combined
    new+indexed population (None disables — only for equivalence
    testing against the uncapped batch pipeline; see module docstring
    for the emission-time semantics).
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        recover_compaction(index_path)
        if replay_hits_compacted(index_path, bid):
            return  # this batch's delta is already in the snapshot

        sigs = minhash_sig_array(batch_df, text_col)
        bands = lsh_bands(sigs)
        new = bands.join(sigs, "doc_id").select(
            "doc_id",
            "band",
            _bucket("band_hash").alias("bucket"),
            "band_hash",
            "sig",
        )

        old = _read_index(spark, index_path, below=bid)

        a = new.select(
            F.col("doc_id").alias("doc_a"),
            "band",
            "bucket",
            "band_hash",
            F.col("sig").alias("sig_a"),
        )
        if max_bucket_docs is not None:
            # Hot-bucket cap over everything known at this batch's
            # horizon.  Filtering the `a` side alone suffices: every
            # candidate join below takes its left leg from `a`, so a
            # dropped bucket proposes nothing.  `hot` is tiny (bucket
            # keys over the cap) — broadcast anti-join, no extra pass
            # over the index beyond the count.
            pop = new.select("doc_id", "band", "band_hash")
            if old is not None:
                pop = pop.unionByName(old.select("doc_id", "band", "band_hash"))
            hot = (
                pop.groupBy("band", "band_hash")
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > max_bucket_docs)
                .select("band", "band_hash")
            )
            a = a.join(F.broadcast(hot), ["band", "band_hash"], "left_anti")

        # new-vs-new: within-batch candidates
        b_new = new.select(
            F.col("doc_id").alias("doc_b"),
            "band",
            "bucket",
            "band_hash",
            F.col("sig").alias("sig_b"),
        )
        cand = a.join(b_new, ["band", "bucket", "band_hash"]).where(
            F.col("doc_a") < F.col("doc_b")
        )
        if old is not None:
            # new-vs-index: (band, bucket) in the join keys lines up
            # with the index partitioning so the scan prunes to the
            # buckets this batch touches; both orientations normalized
            # to a < b.
            b_old = old.select(
                F.col("doc_id").alias("doc_b"),
                "band",
                "bucket",
                "band_hash",
                F.col("sig").alias("sig_b"),
            )
            cross = a.join(b_old, ["band", "bucket", "band_hash"]).select(
                F.least("doc_a", "doc_b").alias("doc_a_n"),
                F.greatest("doc_a", "doc_b").alias("doc_b_n"),
                F.when(F.col("doc_a") < F.col("doc_b"), F.col("sig_a"))
                .otherwise(F.col("sig_b"))
                .alias("sig_a"),
                F.when(F.col("doc_a") < F.col("doc_b"), F.col("sig_b"))
                .otherwise(F.col("sig_a"))
                .alias("sig_b"),
            ).select(
                F.col("doc_a_n").alias("doc_a"),
                F.col("doc_b_n").alias("doc_b"),
                "sig_a",
                "sig_b",
            )
            cand = cand.select("doc_a", "doc_b", "sig_a", "sig_b").unionByName(
                cross
            )
        else:
            cand = cand.select("doc_a", "doc_b", "sig_a", "sig_b")

        pairs = (
            cand.dropDuplicates(["doc_a", "doc_b"])
            .select("doc_a", "doc_b", _est_jaccard())
            .where(F.col("est_jaccard") >= threshold)
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_path, f"v{bid}")
        )
        new.write.mode("overwrite").partitionBy("band", "bucket").parquet(
            os.path.join(index_path, f"v{bid}")
        )

    return write


def read_neardup_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """All pairs emitted so far (union of committed batch outputs)."""
    vs = _versions(pairs_path)
    if not vs:
        raise FileNotFoundError(f"no committed pairs under {pairs_path}")
    return spark.read.parquet(
        *[os.path.join(pairs_path, f"v{v}") for v in vs]
    )


def compact_index(spark: SparkSession, index_path: str) -> int:
    """Fold all committed index versions into a single v{max}
    partitioned snapshot and drop the olders — bounds the
    versions-per-read cost for long-running streams.  Returns the
    surviving version number.  Crash-recoverable via
    :func:`recover_compaction` (the staged dir name carries the
    target id); not atomic against a CONCURRENT writer — run from
    the maintenance path (same operational slot as
    sinks.vacuum_versions)."""
    import shutil

    recover_compaction(index_path)
    vs = _versions(index_path)
    if len(vs) <= 1:
        return vs[0] if vs else -1
    merged = _read_index(spark, index_path, below=vs[-1] + 1)
    tmp = os.path.join(index_path, f"_compact_tmp_v{vs[-1]}")
    merged.write.mode("overwrite").partitionBy("band", "bucket").parquet(tmp)
    open(os.path.join(tmp, COMPACTED_MARKER), "w").close()
    for v in vs:
        shutil.rmtree(os.path.join(index_path, f"v{v}"))
    os.rename(tmp, os.path.join(index_path, f"v{vs[-1]}"))
    return vs[-1]
