"""The reference experiment at full scale, end to end.

Replicates /root/reference exactly as configured in Main.scala:13-29:
two source partitions of dense pageviews (1 event/second of event
time), intervals 2016-02-01→03 and 2016-02-02→04 (1-day skew), keyed by
url, counted per 1-hour tumbling event-time window, with min-of-inputs
watermark semantics — then verifies the README.md:49-58 expectations:

- 720 result rows (72 event-time hours × 10 urls);
- per url-hour counts ≈360 on the non-overlap days, ≈720 on 2016-02-02;
- Σ counts == 345,600 (the full input);
- no window fired before the min source watermark passed its end.

Run:  python examples/reference_experiment.py [--stream]

Batch mode (default) runs the same logical plan through the batch
engine; --stream replays it through Structured Streaming with one file
source per skewed partition (SURVEY §1.4's union-of-sources encoding)
and asserts the firing-order invariants.  Prints the physical plan
(reference Main.scala:28) before executing.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark import get_spark
from flink_repartition_watermark_example_spark.api import keyed
from flink_repartition_watermark_example_spark.plans.introspect import explain_str
from flink_repartition_watermark_example_spark.sources.generator import skewed_pageview_partitions
from flink_repartition_watermark_example_spark.streaming.replica import (
    run_skew_experiment,
    write_close_sentinel,
)

EXPECTED_EVENTS = 345_600  # 2 partitions × 2 days × 86,400 (BASELINE.md)


def check(rows) -> None:
    total = sum(r.aggregate for r in rows)
    urls = {r.url for r in rows}
    assert total == EXPECTED_EVENTS, f"conservation violated: {total}"
    assert len(rows) == 720, f"expected 720 url-hours, got {len(rows)}"
    assert len(urls) == 10
    day2 = [r.aggregate for r in rows if r.window_start.day == 2]
    day1 = [r.aggregate for r in rows if r.window_start.day == 1]
    avg1, avg2 = sum(day1) / len(day1), sum(day2) / len(day2)
    assert 300 < avg1 < 420, avg1  # ~360/url-hour single partition
    assert 600 < avg2 < 840, avg2  # ~720 on the overlap day
    print(f"OK: {len(rows)} windows, Σ={total}, day1≈{avg1:.0f}, day2≈{avg2:.0f}")


def main(stream: bool) -> None:
    spark = get_spark(app_name="reference-experiment")
    parts = skewed_pageview_partitions(spark)  # Main.scala:13-16 config

    if not stream:
        unioned = parts[0].unionByName(parts[1])
        out = keyed(unioned, by="url").time_window("1 hour").count()
        print(explain_str(out, "formatted"))  # Main.scala:28
        check(out.collect())
        return

    with tempfile.TemporaryDirectory() as base:
        dirs = []
        for i, p in enumerate(parts):
            d = f"{base}/part{i}"
            # One file per 6 event-time hours, written SEQUENTIALLY —
            # the file source replays by modification time, so on-disk
            # order must follow event time or later-written early
            # events would arrive behind the watermark and be dropped.
            chunked = p.withColumn(
                "chunk", F.floor(F.dayofyear("ts") * 4 + F.hour("ts") / 6)
            ).persist()
            chunks = sorted(
                r.chunk for r in chunked.select("chunk").distinct().collect()
            )
            for c in chunks:
                chunked.where(F.col("chunk") == c).drop("chunk").coalesce(1).write.mode(
                    "append"
                ).parquet(d)
            chunked.unpersist()
            write_close_sentinel(spark, d)
            dirs.append(d)
        result = run_skew_experiment(spark, dirs, files_per_trigger=1)
        rows = result.emitted_rows
        check(rows)
        fired = {(r.window_start, r.url) for r in rows}
        assert len(fired) == len(rows), "a window fired twice"
        print(f"batches: {[(b, len(rs)) for b, rs in result.batches]}")
        print(f"watermarks: {result.watermarks}")


if __name__ == "__main__":
    main(stream="--stream" in sys.argv)
