"""Multimodal query registrations.  ``multimodal_features`` is oracle-
checked (byte length + md5 digest are SQL-expressible over the text the
payload was fabricated from); the fake-decode path is registered
without an oracle → the driver's rows-only check."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators import multimodal as MM
from flink_repartition_watermark_example_spark.queries import register
from flink_repartition_watermark_example_spark.sources.tables import load_table


@register(
    "multimodal_features",
    """
    SELECT doc_id,
           'text' AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
    doc="Binary-payload plumbing: documents → opaque payload + meta "
    "struct → Arrow-batched mapInPandas feature extraction; the "
    "oracle recomputes size/digest from the source text.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return MM.extract_features(MM.attach_payload(docs))


@register(
    "multimodal_fake_decode",
    None,  # decoder output is not SQL-expressible → rows-only check
    doc="Deterministic pseudo-decode to fixed-width feature vectors via "
    "mapInPandas — the real-decoder plumbing with a seeded stand-in "
    "(media libs are stubbed in this environment).",
)
def q_multimodal_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = MM.fake_decode_features(MM.attach_payload(docs))
    return decoded.select(
        "doc_id",
        F.aggregate(
            F.col("features"), F.lit(0.0), lambda acc, x: acc + x
        ).alias("feature_sum"),
    )
