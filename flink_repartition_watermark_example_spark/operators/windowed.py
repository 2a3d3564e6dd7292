"""Keyed tumbling event-time window aggregation.

This is the reference's entire dataflow collapsed into one declarative
plan (reference Main.scala:24-26: ``keyBy(_.url).timeWindow(Time.hours(1))
.apply(zero, count, collect)``), mapping SURVEY §2 operators S5-S9:

- S5 keyBy hash repartition  → the Exchange Catalyst inserts under groupBy
- S6 tumbling window assign  → ``F.window(ts, size)`` (floor semantics:
  an event exactly on the boundary belongs to the starting window, same
  as Flink's ``ts - ts % size``)
- S7 incremental fold count  → partial (map-side) hash aggregation
- S8 combine partials        → final hash aggregation after the shuffle
- S9 window-apply finalize   → window.start/window.end/key columns are
  already materialized by the groupBy; no apply step needed
  (WindowAggregate.scala:36-37 becomes a select)

Scale: count/sum are algebraic, so Spark's partial+final agg keeps the
shuffle tiny — per shuffle partition only (#keys × #open-windows) rows
move, regardless of input volume.  This is exactly the O(1)-per-group
state of the reference's FoldingStateDescriptor (README.md:66), but
map-side-combined as well.  Works identically on batch DataFrames and
streaming DataFrames (where the same plan becomes incremental state in
the state store).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    aggs: Sequence[Column],
    window_size: str = "1 hour",
) -> DataFrame:
    """Group by tumbling window + keys and apply ``aggs``.

    Output columns: ``window_start``, ``window_end`` (half-open bounds,
    matching WindowAggregate.scala:18's ``[start, end)`` rendering),
    the key columns, then the aggregates in order.
    """
    grouped = df.groupBy(F.window(F.col(ts_col), window_size), *key_cols)
    out = grouped.agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *key_cols,
        *[F.col(c) for c in out.columns[1 + len(key_cols):]],
    )


def windowed_count(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    window_size: str = "1 hour",
) -> DataFrame:
    """The reference's flagship helper — windowed count on a keyed
    stream (the intended reusable surface per the abandoned wrapper at
    package.scala:5-8)."""
    return windowed_agg(
        df, ts_col, key_cols, [F.count(F.lit(1)).alias("aggregate")], window_size
    )
