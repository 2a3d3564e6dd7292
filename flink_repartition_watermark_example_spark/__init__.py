"""PySpark-native analytics engine with the capabilities of
zcox/flink-repartition-watermark-example.

The reference (/root/reference, Flink 1.0, ~140 LoC Scala) demonstrates
event-time tumbling-window keyed counting with min-of-inputs watermark
semantics under partition skew (reference README.md:17-58). This package
re-expresses that surface — and the extended large-scale data-pipeline
surface (dedup, similarity search, text analysis, multimodal plumbing) —
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the event-time semantics, Pandas UDFs only where built-ins
cannot express the semantics.

Layout:
  session      SparkSession factory (UTC, AQE, scale-aware shuffle conf)
  datamodel    explicit schemas for the test tables (SURVEY §1.3)
  sources/     parquet table loaders, seeded generators, streaming sources
  operators/   windowed aggregation, dedup family, similarity, text
  functions/   reusable column expressions (cosine, hashing, shingles)
  plans/       plan introspection helpers (reference Main.scala:28)
  streaming/   union-of-sources watermark replica (reference README.md:23-45)
"""

from flink_repartition_watermark_example_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
