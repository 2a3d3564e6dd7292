"""Multimodal column plumbing (north-star surface).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extraction run as Arrow-batched pandas
iterators (``mapInPandas``) so bytes move Spark→Python in columnar
batches, never row-at-a-time.  The actual media decoders are STUBS —
this container has no image/audio libraries — but the Spark-side
contract (schema, batch iteration, partition independence) is real and
tested:

- ``attach_payload``      text → (payload binary, meta struct) — stands
  in for reading real media bytes from a blob store.
- ``extract_features``    per-item byte stats + digest (pure JVM
  expressions — no Python in this hot path).
- ``decode_image``        NotImplementedError stub with the exact
  signature a real decoder would have.
- ``fake_decode_features``  deterministic pseudo-decode (seeded from
  the digest) exercising the fixed-width feature-vector path end-to-end.

Scale: mapInPandas is per-partition streaming — no shuffle, no driver
collect; 100 TB of media shards across executors exactly like any
other scan.  Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
large blobs cannot OOM the Python worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_repartition_watermark_example_spark.scale import fan_out

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)

FRAME_STRIDE = 2  # sample every 2nd frame


def attach_payload(docs: DataFrame, modality: str = "text") -> DataFrame:
    """Opaque payload + typed metadata, the canonical multimodal row
    shape: (id, payload: binary, meta: struct<modality, n_bytes>)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(payloads: DataFrame) -> DataFrame:
    """Byte-level feature extraction over the payload column: size +
    md5 digest.  Both are JVM expressions (``octet_length``/``md5``
    run inside whole-stage codegen over the binary column) — crossing
    into Python to hash bytes costs ~10× for nothing.  Python belongs
    in this pipeline only where a real media decoder does
    (fake_decode_features shows that mapInPandas shape)."""
    return payloads.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5(F.col("payload")).alias("digest"),
    )


def fake_frame_sample(payloads: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Video-style frame sampling plumbing: each payload row expands to
    one output row per sampled frame (every ``stride``-th of the
    payload's deterministic pseudo frame count) — the 1→N flatMap
    shape across the Arrow boundary a real ffmpeg-backed sampler uses.
    The per-frame decode is a deterministic stand-in (digest of
    payload + frame index); a real decoder replaces only the inner
    loop, the Spark-side contract (schema, batching, per-partition
    independence, row expansion) is exactly this."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, digests = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                n_frames = len(raw) % 7 + 3  # fake container metadata
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(raw + b":" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_digest": digests}
            )

    flat = fan_out(payloads.select("doc_id", "payload"), "doc_id")
    return flat.mapInPandas(batches, FRAMES_SCHEMA)


def decode_image(payloads: DataFrame) -> DataFrame:
    """Real image decode (resize / pixel stats) — requires an imaging
    library this environment does not ship.  The signature and schema
    are the contract a production decoder implements via mapInPandas."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow); "
        "use fake_decode_features for plumbing tests"
    )


def fake_decode_features(payloads: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic stand-in for a media decoder: a fixed-width feature
    vector derived from the payload digest.  Exercises the exact
    mapInPandas path (schema, Arrow batches, array<double> output) a
    real decoder would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf["payload"]:
                d = hashlib.md5(bytes(b)).digest()
                feats.append([d[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    # Flat columns only across the Arrow boundary (struct columns
    # materialize as per-row Python dicts on the pandas side — measured
    # ~15× slower than flat columns on 5k docs).  fan_out raises the
    # narrow scan's parallelism to the session default before the
    # CPU-bound Python stage — the pre-shuffle rows are cheap (ids +
    # payloads), the decode work is what must run full-width.
    flat = fan_out(payloads.select("doc_id", "payload"), "doc_id")
    return flat.mapInPandas(batches, DECODED_SCHEMA)
