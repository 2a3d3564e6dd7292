"""Fluent keyed-window API tests — the wrapper must compile to exactly
the plans of the underlying operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.api import keyed
from flink_repartition_watermark_example_spark.operators.windowed import windowed_count
from flink_repartition_watermark_example_spark.sources.tables import load_table


def test_count_equals_operator(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = keyed(ev, by="event_type").time_window("1 hour").count().collect()
    b = windowed_count(ev, "ts", ["event_type"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_multi_key_and_custom_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = (
        keyed(ev, by=["event_type", "user_id"])
        .time_window("1 day")
        .apply(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
    )
    assert out.columns == ["window_start", "window_end", "event_type", "user_id", "n", "mx"]
    assert out.count() > 0


def test_sliding_assigns_two_windows_per_event(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    out = keyed(ev, by="event_type").time_window("1 hour").sliding("30 minutes").count()
    assert out.agg(F.sum("aggregate")).first()[0] == 2 * n_events


def test_watermark_noop_in_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = keyed(ev, by="event_type", watermark="0 seconds").time_window("1 hour").count()
    b = keyed(ev, by="event_type").time_window("1 hour").count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fluent_session_window_matches_gaps_and_islands(spark):
    """keyed(...).session_window(gap).count() must merge rows closer
    than the gap and split across quiet periods."""
    from flink_repartition_watermark_example_spark.api import keyed

    rows = [
        ("u", "2024-01-01 10:00:00"),
        ("u", "2024-01-01 10:03:00"),   # same session (< 5 min gap)
        ("u", "2024-01-01 10:20:00"),   # new session
        ("v", "2024-01-01 10:01:00"),
    ]
    df = spark.createDataFrame(rows, ["url", "s"]).select(
        "url", F.col("s").cast("timestamp").alias("ts")
    )
    out = keyed(df, by="url").session_window("5 minutes").count()
    got = sorted((r.url, r.window_start.minute, r.aggregate) for r in out.collect())
    assert got == [("u", 0, 2), ("u", 20, 1), ("v", 1, 1)]
