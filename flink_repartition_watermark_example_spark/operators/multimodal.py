"""Multimodal column plumbing (north-star surface).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extraction run as Arrow-batched pandas
iterators (``mapInPandas``) so bytes move Spark→Python in columnar
batches, never row-at-a-time.

- ``attach_payload``      text → (payload binary, meta struct) — stands
  in for reading real media bytes from a blob store.
- ``extract_features``    per-item byte stats + digest (pure JVM
  expressions — no Python in this hot path).
- ``decode_image``        REAL decoder for the uncompressed raster
  formats pure numpy can parse (24-bit BMP, PPM P6): header fields,
  row padding, bottom-up order, channel order — plus
  ``synth_image_payload`` fabricating genuine bytes from a closed-form
  pixel function so a SQL oracle value-checks the decode.  Compressed
  codecs (JPEG/PNG) would swap only the inner parse for an imaging
  library; the Spark-side contract is identical.
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


# --- real image codec (uncompressed formats, no imaging lib needed) -------
#
# The container ships no Pillow/ffmpeg, but uncompressed raster
# formats are pure byte layout — so the decoder below is REAL: it
# parses genuine BMP (BITMAPINFOHEADER, 24-bit, bottom-up rows, 4-byte
# row padding, BGR order) and PPM P6 (ASCII header + raw RGB) payloads
# with numpy only.  A JPEG/PNG decoder would replace only the inner
# parse; the Spark-side contract (mapInPandas over binary, Arrow
# batches, per-partition streaming) is identical.

IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def encode_bmp(arr) -> bytes:
    """24-bit uncompressed BMP from an (h, w, 3) uint8 RGB array —
    BITMAPINFOHEADER, bottom-up row order, BGR pixels, rows padded to
    4 bytes."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    row_size = (w * 3 + 3) // 4 * 4
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 0, 0, 0, 0)
    pad = b"\x00" * (row_size - w * 3)
    bgr = a[:, :, ::-1]
    rows = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    return header + info + rows


def encode_ppm(arr) -> bytes:
    """PPM P6 (binary) from an (h, w, 3) uint8 RGB array."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_image_bytes(raw: bytes):
    """Parse one BMP (uncompressed 24-bit) or PPM P6 payload to an
    (h, w, 3) uint8 RGB array.  Format dispatch by magic bytes — the
    shape a production decoder takes, minus the compressed codecs."""
    import struct

    import numpy as np

    if raw[:2] == b"BM":
        (offset,) = struct.unpack_from("<I", raw, 10)
        _, w, h = struct.unpack_from("<Iii", raw, 14)
        (bpp,) = struct.unpack_from("<H", raw, 28)
        (comp,) = struct.unpack_from("<I", raw, 30)
        if bpp != 24 or comp != 0:
            raise ValueError(f"unsupported BMP profile: bpp={bpp} comp={comp}")
        top_down, h = h < 0, abs(h)
        row_size = (w * 3 + 3) // 4 * 4
        out = np.empty((h, w, 3), np.uint8)
        for i in range(h):
            row = np.frombuffer(raw, np.uint8, w * 3, offset + i * row_size)
            out[i if top_down else h - 1 - i] = row.reshape(w, 3)[:, ::-1]
        return "bmp", out
    if raw[:2] == b"P6":
        # header: magic, width, height, maxval — whitespace separated
        parts, pos = [], 2
        while len(parts) < 3:
            while raw[pos] in b" \t\r\n":
                pos += 1
            end = pos
            while raw[end] not in b" \t\r\n":
                end += 1
            parts.append(int(raw[pos:end]))
            pos = end
        pos += 1  # single whitespace after maxval
        w, h, maxval = parts
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        return "ppm", np.frombuffer(raw, np.uint8, w * h * 3, pos).reshape(h, w, 3)
    raise ValueError(f"unknown image magic {raw[:2]!r}")


def synth_image_payload(docs: DataFrame) -> DataFrame:
    """Deterministic image fixture: each doc gets a small RGB image
    whose pixel (x, y) is a closed-form function of doc_id (so a SQL
    oracle can recompute the decoded stats), encoded to REAL bytes —
    BMP for even doc_ids, PPM for odd — via mapInPandas.  Stands in
    for reading media blobs from object storage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 5, 4 + d % 3
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                img = np.stack(
                    [
                        (d + 3 * x + 7 * y) % 256,
                        (2 * d + 5 * x + y) % 256,
                        (3 * d + x + 11 * y) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(
                    encode_bmp(img) if d % 2 == 0 else encode_ppm(img)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    flat = fan_out(docs.select("doc_id"), "doc_id")
    return flat.mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def decode_image(payloads: DataFrame) -> DataFrame:
    """REAL image decode over binary payloads via mapInPandas: parses
    each BMP/PPM byte stream (magic sniff, header fields, row padding,
    bottom-up order, channel order) and emits per-image dimensions and
    exact per-channel pixel sums.  Arrow-batched, per-partition
    streaming — at 100 TB this is a scan-shaped stage with no shuffle;
    batch size bounded by arrow.maxRecordsPerBatch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "format", "width", "height",
                                    "sum_r", "sum_g", "sum_b")}
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                fmt, img = decode_image_bytes(bytes(b))
                sums = img.astype("int64").sum(axis=(0, 1))
                rows["doc_id"].append(doc_id)
                rows["format"].append(fmt)
                rows["width"].append(img.shape[1])
                rows["height"].append(img.shape[0])
                rows["sum_r"].append(sums[0])
                rows["sum_g"].append(sums[1])
                rows["sum_b"].append(sums[2])
            yield pd.DataFrame(rows)

    flat = fan_out(payloads.select("doc_id", "payload"), "doc_id")
    return flat.mapInPandas(batches, IMAGE_STATS_SCHEMA)


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
