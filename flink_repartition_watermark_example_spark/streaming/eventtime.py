"""Event-time column normalization for streaming inputs.

Structured Streaming's watermark operator only accepts ``TIMESTAMP``
(``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` otherwise), but the test
parquet's ``ts`` column has shipped in three encodings across data
generations: int64 epoch nanos, ``TIMESTAMP_NTZ`` (micros, no zone),
and plain ``TIMESTAMP``.  Every streaming entry point funnels through
:func:`ensure_event_time` so watermarks always see ``TIMESTAMP``.

The NTZ→LTZ cast reinterprets the wall-clock in the session timezone,
which this engine pins to UTC (session.py) — so the conversion is a
deterministic relabeling, not a shift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ensure_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` usable as a watermark column
    (``TIMESTAMP``): rescale legacy int64 epoch nanos, relabel
    ``TIMESTAMP_NTZ`` via a UTC-session cast, pass ``TIMESTAMP``
    through unchanged."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dtype, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
