"""Incremental near-duplicate detection over a document stream —
LSH index maintenance as data arrives, the shape a production dedup
service runs continuously instead of re-scanning the corpus.

Per micro-batch (foreachBatch, like the CDC MERGE sink):

1. the batch's docs get minhash signatures + LSH band hashes
   (operators/dedup.py — identical geometry to the batch pipeline);
2. candidate pairs = new-vs-INDEX (equi-join on (band, band_hash)
   against the persisted index) plus new-vs-new (within-batch
   self-join) — an arriving doc is checked against everything seen
   WITHOUT rescanning it;
3. confirmed pairs (estimated jaccard ≥ threshold over the signature
   arrays) append to the pairs output, and the batch's signatures and
   bands merge into the index.

Exactly-once under crash replay uses the same versioned-directory
device as sinks.cdc_merge_writer: each batch writes its own
``v{batch_id}`` delta of the index and its own pairs partition, so a
replayed batch overwrites itself instead of duplicating.

Scale shape: the index is partitioned by (band, band_hash) on disk;
per batch the join touches only the buckets the new docs hash into
(partition pruning does the index lookup), so per-batch cost is
O(new docs × bucket sizes), independent of corpus age.  State is the
parquet index — disk-bounded, restart-safe, shared by any number of
readers — not executor memory.

Equivalence contract (tested): streaming the corpus in ANY batch
split yields exactly the pairs of the batch ``lsh_candidate_pairs``
(sans bucket cap) over the full corpus, because minhash signatures
are per-doc and bucket membership is order-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators.dedup import lsh_bands, minhash_sig_array


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


def _read_index(spark: SparkSession, index_path: str, below: int) -> DataFrame | None:
    vs = [v for v in _versions(index_path) if v < below]
    if not vs:
        return None
    return spark.read.parquet(
        *[os.path.join(index_path, f"v{v}") for v in vs]
    )


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
):
    """foreachBatch body: maintain the LSH index and emit near-dup
    candidate pairs (doc_a < doc_b, est_jaccard ≥ threshold) for each
    arriving batch of (doc_id, text) rows."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)

        sigs = minhash_sig_array(batch_df, text_col)
        bands = lsh_bands(sigs)
        new = bands.join(sigs, "doc_id").select("doc_id", "band", "band_hash", "sig")

        old = _read_index(spark, index_path, below=bid)
        a = new.select(
            F.col("doc_id").alias("doc_a"),
            "band",
            "band_hash",
            F.col("sig").alias("sig_a"),
        )
        # new-vs-new: within-batch candidates
        b_new = new.select(
            F.col("doc_id").alias("doc_b"),
            "band",
            "band_hash",
            F.col("sig").alias("sig_b"),
        )
        cand = a.join(b_new, ["band", "band_hash"]).where(
            F.col("doc_a") < F.col("doc_b")
        )
        if old is not None:
            # new-vs-index: both orientations, normalized to a < b
            b_old = old.select(
                F.col("doc_id").alias("doc_b"),
                "band",
                "band_hash",
                F.col("sig").alias("sig_b"),
            )
            cross = a.join(b_old, ["band", "band_hash"]).select(
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
        new.write.mode("overwrite").parquet(
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
