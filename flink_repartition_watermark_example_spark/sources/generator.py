"""Seeded synthetic pageview generator (reference S2).

The reference generates one pageview per ``millisBetweenEvents`` of
event time over a date interval, with a url uniform over 10 values and
a uuid event id (Pageview.scala:13-28, params Main.scala:13-16).  Its
RNG is unseeded; ours is deterministic (SURVEY §5.1 requires seeded
generators so invariants are testable).

Spark-first: the whole generator is ``spark.range`` + built-in column
expressions — it runs distributed, JVM-side, with no Python in the loop,
so generating 10^9 synthetic events on a cluster is a non-event.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

URL_COUNT = 10  # Pageview.scala:15


def _epoch_ms(dt: datetime) -> int:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def pageviews(
    spark: SparkSession,
    start: datetime,
    end: datetime,
    millis_between_events: int = 1000,
    url_count: int = URL_COUNT,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense pageview stream over ``[start, end)``: one event per
    ``millis_between_events`` of event time (Pageview.scala:19-27 with
    Main.scala:13's 1000 ms step), url uniform over ``url_count`` values
    (Pageview.scala:14-16), deterministic id standing in for the uuid
    (Pageview.scala:11).

    Columns: ``url`` string, ``ts`` timestamp, ``event_id`` string.
    """
    start_ms, end_ms = _epoch_ms(start), _epoch_ms(end)
    n = max(0, (end_ms - start_ms) // millis_between_events)
    rng = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    # xxhash64(id, seed) gives a deterministic uniform draw, JVM-side.
    draw = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(url_count))
    return rng.select(
        F.concat(F.lit("http://site.com/"), draw.cast("string")).alias("url"),
        F.timestamp_millis(
            (F.lit(start_ms) + F.col("id") * millis_between_events).cast("long")
        ).alias("ts"),
        F.md5(F.concat_ws("-", F.lit(seed), F.col("id"))).alias("event_id"),
    )


def skewed_pageview_partitions(
    spark: SparkSession,
    intervals: list[tuple[datetime, datetime]] | None = None,
    millis_between_events: int = 1000,
    seed: int = 42,
) -> list[DataFrame]:
    """The reference's watermark-skew fixture (Main.scala:13-16): one
    DataFrame per source partition, with intervals skewed by a day —
    2016-02-01→03 and 2016-02-02→04 by default.  Returned separately
    (NOT unioned) because the streaming replica must attach a watermark
    per source to recover Flink's min-of-inputs semantics (SURVEY §1.4).
    """
    if intervals is None:
        d = lambda *a: datetime(*a, tzinfo=timezone.utc)  # noqa: E731
        intervals = [
            (d(2016, 2, 1), d(2016, 2, 3)),
            (d(2016, 2, 2), d(2016, 2, 4)),
        ]
    return [
        pageviews(spark, s, e, millis_between_events, seed=seed + i, num_partitions=1)
        for i, (s, e) in enumerate(intervals)
    ]
