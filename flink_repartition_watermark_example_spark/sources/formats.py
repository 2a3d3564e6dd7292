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

# Avro ships as an external spark-avro module, not deployed here.
try:  # pragma: no cover - trivial availability probe
    import importlib

    AVRO_AVAILABLE = (
        importlib.util.find_spec("pyspark") is not None and False
    )  # the JVM-side avro DataSource is absent in this build
except Exception:  # noqa: BLE001
    AVRO_AVAILABLE = False

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write ``df`` in any natively-supported format; CSV/JSON get the
    header/timestamp defaults that make them round-trip cleanly."""
    if fmt == "avro" and not AVRO_AVAILABLE:
        raise RuntimeError(
            "the spark-avro external module is not deployed in this "
            "build; use parquet or orc for columnar storage"
        )
    if fmt not in NATIVE_FORMATS:
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
    if fmt == "avro" and not AVRO_AVAILABLE:
        raise RuntimeError(
            "the spark-avro external module is not deployed in this build"
        )
    if fmt not in NATIVE_FORMATS:
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
