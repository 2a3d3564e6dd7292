"""Rate-micro-batch pageview stream: deterministic, dense, in order —
the reference generator's streaming analogue."""

from __future__ import annotations

from datetime import datetime, timezone

from flink_repartition_watermark_example_spark.sources.streams import rate_pageviews
import pytest

pytestmark = pytest.mark.slow  # streaming replays: minute-class


def _run(spark, name, tmp, n_batches=3):
    stream = rate_pageviews(
        spark, datetime(2016, 2, 1, tzinfo=timezone.utc), rows_per_batch=500
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp / name))
        .start()
    )
    import time

    try:
        deadline = time.time() + 120
        while ((q.lastProgress or {}).get("batchId") or -1) < n_batches:
            assert time.time() < deadline, "stream did not reach batch count"
            time.sleep(0.5)
    finally:
        q.stop()
    return spark.sql(
        f"select * from {name} order by ts limit 1000"
    ).collect()


def test_rate_stream_is_deterministic_and_dense(spark, tmp_path):
    a = _run(spark, "rate_a", tmp_path)
    b = _run(spark, "rate_b", tmp_path)
    assert a[:500] == b[:500], "same seed must replay identically"
    # dense 1-second cadence from the configured start, in order
    assert a[0].ts == datetime(2016, 2, 1, 0, 0, 0)
    deltas = {
        (a[i + 1].ts - a[i].ts).total_seconds() for i in range(min(len(a), 400) - 1)
    }
    assert deltas == {1.0}
    assert all(r.url.startswith("http://site.com/") for r in a[:50])


def test_kafka_source_raises_cleanly_without_connector(spark):
    """The Kafka helper must fail with an actionable message (not a
    raw ClassNotFoundException) when the connector jar is absent —
    and if a jar IS present, it must build a streaming plan."""
    from flink_repartition_watermark_example_spark.sources.streams import kafka_pageviews

    try:
        df = kafka_pageviews(spark, "broker:9092", "pageviews")
    except NotImplementedError as e:
        assert "spark-sql-kafka" in str(e)
    else:
        assert df.isStreaming and set(df.columns) == {"url", "ts", "event_id"}
