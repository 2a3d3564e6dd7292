"""Stream-stream interval join: multi-batch replay must emit exactly
the batch-join pairs, each exactly once (append mode)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.streaming.join import (
    interval_join_views_purchases,
)
import pytest

pytestmark = pytest.mark.slow  # streaming replays: minute-class


def _write_files(spark, path, rows, schema):
    # one file per row-group, written sequentially so file-mtime replay
    # order matches event-time order (see verify notes)
    import time

    for i, chunk in enumerate(rows):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        time.sleep(0.05)


def test_interval_join_matches_batch(spark, tmp_path):
    schema = "event_id long, ts timestamp, user_id long"
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    views = [
        [(1, t0, 7)],
        [(2, t0 + timedelta(hours=2), 7), (3, t0 + timedelta(hours=2), 8)],
    ]
    purchases = [
        [(101, t0 + timedelta(hours=1), 7)],     # joins view 1
        [(102, t0 + timedelta(hours=7), 7),      # joins view 2 (5h gap), NOT view 1 (7h)
         (103, t0 + timedelta(hours=3), 9)],     # no matching user
    ]
    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purch")
    _write_files(spark, vdir, views, schema)
    _write_files(spark, pdir, purchases, schema)

    vs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(vdir)
    ps = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(pdir)
    out = interval_join_views_purchases(vs, ps, range_hours=6)
    q = (
        out.writeStream.format("memory")
        .queryName("ij_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("select * from ij_test").collect()))
    assert got == [(1, 101, 7), (2, 102, 7)]

    # batch equivalence on the same files
    bv = spark.read.parquet(vdir).selectExpr(
        "event_id as view_id", "ts as view_ts", "user_id"
    )
    bp = spark.read.parquet(pdir).selectExpr(
        "event_id as purchase_id", "ts as purchase_ts", "user_id as p_user_id"
    )
    batch = sorted(
        map(
            tuple,
            bv.join(
                bp,
                (F.col("user_id") == F.col("p_user_id"))
                & (F.col("purchase_ts") > F.col("view_ts"))
                & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 6 HOURS")),
            )
            .select("view_id", "purchase_id", "user_id")
            .collect(),
        )
    )
    assert got == batch


def test_stream_static_enrichment_matches_batch_and_is_stateless(
    spark, sf_dir, tmp_path
):
    """Dimension enrichment of a stream: per-micro-batch broadcast
    join, no watermark, no streaming state; result equals the batch
    join over the same files."""
    from flink_repartition_watermark_example_spark.sources.tables import load_table
    from flink_repartition_watermark_example_spark.streaming.join import enrich_with_dim

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey as user_id", "c_mktsegment"
    )
    src = str(tmp_path / "ev_src")
    ev.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .select("event_id", "user_id")
    )
    name = "enrich_test"
    q = (
        enrich_with_dim(stream, cust, on="user_id", how="left")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table(name).collect()))
    want = sorted(
        map(
            tuple,
            ev.select("event_id", "user_id").join(cust, "user_id", "left").collect(),
        )
    )
    assert got == want
    assert any(r[-1] is not None for r in got), "dim join never matched"


def test_left_outer_interval_join_emits_null_on_watermark_finality(spark, tmp_path):
    """Unmatched views must emit (view, null) — but only once the
    watermark proves no in-range purchase can still arrive."""
    from flink_repartition_watermark_example_spark.streaming.join import (
        interval_join_left_outer,
    )

    schema = "event_id long, ts timestamp, user_id long"
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    views = [
        [(1, t0, 7)],
        [(2, t0 + timedelta(hours=2), 7), (3, t0 + timedelta(hours=2), 8)],
        # close sentinel: advances the view-side watermark far past
        # every real view; filtered out of the assertion below
        [(999, t0 + timedelta(hours=100), -1)],
    ]
    purchases = [
        [(101, t0 + timedelta(hours=1), 7)],
        [(102, t0 + timedelta(hours=7), 7)],
        # purchase-side sentinel: moves the watermark that gates
        # null-emission for unmatched views
        [(998, t0 + timedelta(hours=100), -2)],
    ]
    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purch")
    _write_files(spark, vdir, views, schema)
    _write_files(spark, pdir, purchases, schema)

    vs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(vdir)
    ps = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(pdir)
    out = interval_join_left_outer(vs, ps, range_hours=6)
    q = (
        out.writeStream.format("memory")
        .queryName("loj_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_loj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        map(tuple, spark.sql("select * from loj_test where user_id >= 0").collect())
    )
    # view 1 pairs with purchase 101 (1h later), view 2 with 102 (5h),
    # view 3 (user 8) has no purchase — emits null once the purchase
    # watermark passes t0+8h
    assert got == [(1, 101, 7), (2, 102, 7), (3, None, 8)]
