"""Fluent keyed-window API — the reference's intended reusable surface.

The reference sketches (and comments out) a convenience wrapper giving
windowed streams a ``.count`` helper (package.scala:5-8); its actual
pipeline is ``keyBy(_.url).timeWindow(Time.hours(1)).apply(zero, count,
collect)`` (Main.scala:24-26).  This module exposes that shape over
DataFrames — batch or streaming — while compiling to the same
declarative plan as operators/windowed.py (Catalyst sees no wrapper).

    >>> from flink_repartition_watermark_example_spark.api import keyed
    >>> out = keyed(events, by="event_type").time_window("1 hour").count()
    >>> skewed = keyed(union_sources, by="url", ts="ts",
    ...               watermark="0 seconds").time_window("1 hour").count()
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators.windowed import windowed_agg


@dataclass(frozen=True)
class KeyedStream:
    """A stream partitioned by key (reference `keyBy`, Main.scala:24).
    In Spark the hash exchange is implied by the downstream groupBy —
    construction is free."""

    df: DataFrame
    keys: tuple[str, ...]
    ts: str = "ts"

    def time_window(self, size: str) -> "WindowedStream":
        """Tumbling event-time windows (reference `timeWindow`,
        Main.scala:25; floor semantics, half-open bounds)."""
        return WindowedStream(self.df, self.keys, self.ts, size)

    def session_window(self, gap: str) -> "WindowedStream":
        """Gap-based session windows (beyond the reference's tumbling
        surface; Flink-next's `EventTimeSessionWindows` analogue) —
        Spark's native `session_window` merges per-key state until a
        quiet period of ``gap``."""
        return WindowedStream(
            self.df, self.keys, self.ts, gap, session=True
        )


@dataclass(frozen=True)
class WindowedStream:
    df: DataFrame
    keys: tuple[str, ...]
    ts: str
    size: str
    slide: str | None = None
    session: bool = False

    def sliding(self, slide: str) -> "WindowedStream":
        return WindowedStream(self.df, self.keys, self.ts, self.size, slide)

    def apply(self, *aggs: Column) -> DataFrame:
        """Reference `apply(zero, fold, collect)` (Main.scala:26,
        WindowAggregate.scala:22-37): arbitrary aggregates per
        key+window; key and window bounds are stamped on the output for
        free (S9)."""
        if self.session:
            win = F.session_window(F.col(self.ts), self.size)
        elif self.slide is not None:
            win = F.window(F.col(self.ts), self.size, self.slide)
        else:
            return windowed_agg(
                self.df, self.ts, list(self.keys), list(aggs), self.size
            )
        out = self.df.groupBy(win, *self.keys).agg(*aggs)
        bounds = "session_window" if self.session else "window"
        return out.select(
            F.col(f"{bounds}.start").alias("window_start"),
            F.col(f"{bounds}.end").alias("window_end"),
            *self.keys,
            *[F.col(c) for c in out.columns[1 + len(self.keys):]],
        )

    def count(self) -> DataFrame:
        """The wrapper the reference wished for (package.scala:5-8)."""
        return self.apply(F.count(F.lit(1)).alias("aggregate"))

    def sum(self, col: str) -> DataFrame:
        return self.apply(F.sum(col).alias("aggregate"))


def keyed(
    df: DataFrame,
    by: str | Sequence[str],
    ts: str = "ts",
    watermark: str | None = None,
) -> KeyedStream:
    """Entry point: key a (batch or streaming) DataFrame.

    ``watermark`` attaches an event-time watermark first (reference
    `assignTimestampsAndWatermarks`, Main.scala:23) — required for
    append-mode streaming, a no-op in batch.
    """
    if watermark is not None:
        df = df.withWatermark(ts, watermark)
    keys = (by,) if isinstance(by, str) else tuple(by)
    return KeyedStream(df=df, keys=keys, ts=ts)
