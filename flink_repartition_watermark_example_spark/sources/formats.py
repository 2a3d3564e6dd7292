"""Batch file-format surface: one reader/writer pair covering every
format this Spark build ships natively (parquet, ORC, CSV, JSON,
text), with the absent external module (Avro) gated exactly like the
Kafka connector (sources/streams.py).

Format notes that matter at 100 TB:
- parquet/ORC are the only columnar options — predicate pushdown,
  column pruning, and min-max skipping work on both (ORC additionally
  carries bloom filters per stripe when written with
  ``orc.bloom.filter.columns``).
- CSV/JSON are row-oriented interchange: schema must be supplied (or
  pay a full inference scan), timestamps need an explicit format, and
  nothing prunes — they are ingest/egress formats, not storage.
- text is one line per row, for raw-corpus ingestion ahead of the
  document pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NATIVE_FORMATS = ("parquet", "orc", "csv", "json", "text")

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def avro_available(spark: SparkSession) -> bool:
    """Whether the external spark-avro module is deployed, probed
    against the JVM DataSource registry itself (the same lookup the
    reader/writer would hit) — not a Python-side guess."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:  # noqa: BLE001 - absent module surfaces as ClassNotFound
        return False


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write ``df`` in any natively-supported format; CSV/JSON get the
    header/timestamp defaults that make them round-trip cleanly."""
    if fmt == "avro":
        if not avro_available(df.sparkSession):
            raise RuntimeError(
                "the spark-avro external module is not deployed in this "
                "build; use parquet or orc for columnar storage"
            )
    elif fmt not in NATIVE_FORMATS:
        raise ValueError(f"unknown format {fmt!r}; native: {NATIVE_FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", _TS_FMT)
    if fmt == "json":
        w = w.option("timestampFormat", _TS_FMT)
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_table_fmt(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read any natively-supported format.  For CSV/JSON pass the
    schema — inference costs a full extra scan and widens types."""
    if fmt == "avro":
        if not avro_available(spark):
            raise RuntimeError(
                "the spark-avro external module is not deployed in this build"
            )
    elif fmt not in NATIVE_FORMATS:
        raise ValueError(f"unknown format {fmt!r}; native: {NATIVE_FORMATS}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", _TS_FMT)
    if fmt == "json":
        r = r.option("timestampFormat", _TS_FMT)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)
