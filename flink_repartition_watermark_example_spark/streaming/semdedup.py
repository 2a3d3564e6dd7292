"""Incremental SemDeDup over an embedding stream — semantic-dedup
index maintenance as vectors arrive, the continuous counterpart of
``operators.similarity.semantic_dedup`` exactly as
``streaming/neardup.py`` is the continuous LSH pipeline.

Per micro-batch (foreachBatch, the CDC-MERGE-sink device):

1. the batch's vectors are assigned to their nearest coarse centroid
   through the same fold-exact numpy kernel as the batch operator
   (centroids ship in the closure — trained once, exactly the
   production pattern);
2. an arriving vector is PURGED when some cluster-mate with a LOWER
   vec_id — already indexed, or earlier in this batch — has cosine
   >= threshold with it; candidate generation is new-vs-INDEX plus
   new-vs-new, both equi-joins on list_id, never all-pairs;
3. survivors append to the survivors output; ALL batch vectors
   (survivors and purged alike — lower-id purged vectors still purge
   later arrivals, exactly as in the batch rule) merge into the
   index.

Exactly-once under crash replay uses the versioned-directory device
(`v{batch_id}` deltas + parquet ``_SUCCESS`` commit markers): a
replayed batch overwrites itself instead of duplicating.

Scale shape: each index version is written ``partitionBy("list_id")``
and the new-vs-index join carries list_id in its keys, so the lookup
prunes to the clusters the new vectors fall into — per-batch cost is
O(new vectors x touched-cluster sizes), independent of corpus age.
The centroid count is the corpus-size lever (grow it ~sqrt(n) so
cluster populations stay bounded), identical to the batch operator.
State is the parquet index — disk-bounded, restart-safe — never
executor memory.

Equivalence contract (tested): streaming the corpus in vec_id-ordered
splits yields exactly the batch ``semantic_dedup`` survivors, because
the purge rule only ever consults lower-id vectors and those are all
indexed by arrival time.  With UNORDERED splits the rule is
emission-time (as in streaming/neardup.py's cap semantics): a vector
emitted as a survivor is not retroactively withdrawn when a lower-id
near-twin arrives later; the late twin is purged instead.  A
re-ranked batch pass over the final index reconciles when exact batch
semantics are required.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.functions.vectors import as_double
from flink_repartition_watermark_example_spark.operators.similarity import (
    _fold_dot_matrix,
    _fold_norm,
    _score_pairs,
)
from flink_repartition_watermark_example_spark.streaming.neardup import (
    COMPACTED_MARKER,
    _versions,
    recover_compaction,
    replay_hits_compacted,
)


def _read_index(spark: SparkSession, index_path: str, below: int) -> DataFrame | None:
    vs = [v for v in _versions(index_path) if v < below]
    if not vs:
        return None
    parts = [
        spark.read.parquet(os.path.join(index_path, f"v{v}")) for v in vs
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def semdedup_index_writer(
    index_path: str,
    survivors_path: str,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.25,
):
    """foreachBatch body: maintain the cluster index and emit the
    batch's surviving (vec_id, list_id) rows.

    ``centroids``: [(centroid_id, vector), ...] — the trained coarse
    index, fixed for the stream's lifetime (retraining is a new
    stream + backfill, as in production ANN services)."""
    import numpy as np
    import pandas as pd

    cents = sorted(centroids)
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([cv for _, cv in cents], dtype=np.float64)
    cnorms = _fold_norm(C)

    def assign_top1(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            nv = _fold_norm(V)
            cos = _fold_dot_matrix(V, C) / (nv[:, None] * cnorms[None, :])
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "v": pdf["v"],
                    "nv": nv,
                    "list_id": cids[np.argmax(cos, axis=1)],
                }
            )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bid = int(batch_id)
        recover_compaction(index_path)
        if replay_hits_compacted(index_path, bid):
            return  # this batch's vectors are already in the snapshot
        if batch_df.isEmpty():
            # An empty micro-batch (source idle tick, or a replayed
            # trigger whose files were all consumed) must be a no-op:
            # the partitionBy staging write below would produce a dir
            # with no data files and the re-read would die on
            # UNABLE_TO_INFER_SCHEMA — a crash loop, since every
            # replay of the batch is empty again.  No v{bid} dir is
            # published, which is correct: an empty batch contributes
            # neither index rows nor survivors.
            return

        # Write the assignment to a NON-version staging dir first and
        # re-read it for the joins: the Arrow assignment kernel runs
        # exactly once per batch (uncached, the self-join + anti-join
        # would recompute it ~4x).  The index delta is only PUBLISHED
        # (staging renamed to v{bid}) after the survivors write
        # commits — the same pairs-before-index ordering as
        # streaming/neardup.py — so a folded delta always implies
        # committed survivors.  The reverse order would lose a batch's
        # survivors forever if it crashed between the two writes and
        # compact_index ran while the stream was down: the replay
        # would hit replay_hits_compacted and return before writing
        # them.  Both writes are mode=overwrite, so replays of any
        # crash point are idempotent.
        vdir = os.path.join(index_path, f"v{bid}")
        tmp = os.path.join(index_path, f"_batch_tmp_v{bid}")
        (
            batch_df.select("vec_id", as_double("embedding").alias("v"))
            .mapInPandas(
                assign_top1,
                schema="vec_id long, v array<double>, nv double, list_id long",
            )
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(tmp)
        )
        # partition-column type inference can narrow list_id to int
        new = spark.read.parquet(tmp).withColumn(
            "list_id", F.col("list_id").cast("long")
        )

        mates = new.select("vec_id", "v", "nv", "list_id")
        old = _read_index(spark, index_path, below=bid)
        if old is not None:
            mates = mates.unionByName(
                old.select("vec_id", "v", "nv", "list_id")
            )
        a = mates.select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nqv"),
            F.col("list_id").alias("a_list"),
        )
        joined = new.join(
            a,
            (F.col("a_list") == F.col("list_id"))
            & (F.col("query_id") < F.col("vec_id")),
        ).select("query_id", "qv", "nqv", "vec_id", "v", "nv")
        purged = (
            _score_pairs(joined)
            .where(F.col("cos_sim") >= threshold)
            .select("vec_id")
            .dropDuplicates()
        )
        survivors = new.join(purged, "vec_id", "left_anti").select(
            "vec_id", "list_id"
        )
        survivors.write.mode("overwrite").parquet(
            os.path.join(survivors_path, f"v{bid}")
        )
        # survivors are durable — publish the index delta last.  A
        # replay after a crash between the survivors write and this
        # rename re-runs the whole batch (v{bid} absent, so neither
        # _versions nor replay_hits_compacted sees it) and overwrites
        # both staging and survivors before publishing again.
        import shutil

        if os.path.isdir(vdir):
            shutil.rmtree(vdir)  # replay of a published-but-uncommitted batch
        os.rename(tmp, vdir)

    return write


def read_semdedup_survivors(spark: SparkSession, survivors_path: str) -> DataFrame:
    """All survivors emitted so far (union of committed batch outputs)."""
    vs = _versions(survivors_path)
    if not vs:
        raise FileNotFoundError(f"no committed survivors under {survivors_path}")
    return spark.read.parquet(
        *[os.path.join(survivors_path, f"v{v}") for v in vs]
    )


def compact_index(spark: SparkSession, index_path: str) -> int:
    """Fold all committed index versions into a single v{max}
    partitioned snapshot and drop the olders — reusing the max id so
    future batch_ids never collide (the sketch-module lesson).
    Returns the surviving version number.

    Crash safety: the staging dir name carries the target id
    (``_compact_tmp_v{max}``), so a crash anywhere between the
    deletes and the final rename is repaired by
    :func:`streaming.neardup.recover_compaction` (run at the head of every writer
    batch and of this function) — the index can be transiently
    ABSENT but never silently empty-forever."""
    import shutil

    recover_compaction(index_path)
    vs = _versions(index_path)
    if len(vs) <= 1:
        return vs[0] if vs else -1
    merged = _read_index(spark, index_path, below=vs[-1] + 1)
    tmp = os.path.join(index_path, f"_compact_tmp_v{vs[-1]}")
    merged.write.mode("overwrite").partitionBy("list_id").parquet(tmp)
    open(os.path.join(tmp, COMPACTED_MARKER), "w").close()
    for v in vs:
        shutil.rmtree(os.path.join(index_path, f"v{v}"))
    os.rename(tmp, os.path.join(index_path, f"v{vs[-1]}"))
    return vs[-1]
