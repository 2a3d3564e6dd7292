"""Batch parquet sources.

The reference's only source is an in-memory parallel collection
(SplittableIteratorFromSeqs.scala:8-11, wired Main.scala:22); the engine
generalizes to parquet scans.  Scale notes:

- Loads are plain ``spark.read.parquet`` so Catalyst keeps predicate
  pushdown / column pruning / partition pruning — callers filter and
  select on the returned DataFrame and the scan narrows automatically
  (verify with ``.explain``: PushedFilters / ReadSchema).
- No ``.cache()`` here: at 100 TB caching a scan is a regression, and
  AQE already reuses exchanges within a query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_repartition_watermark_example_spark.datamodel import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table, e.g. ``load_table(spark, sf_dir, "lineitem")``."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    # reader rejects; read nanos as long and rescale to microseconds
    # with integer division (double division would lose precision —
    # 2024-epoch nanos ≈ 1.7e18 exceeds a double's 53-bit mantissa).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle uses."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
