"""Sketch-family queries: bitmap exact-distinct and count-min-sketch
heavy hitters (operators/sketch.py).

Extends the engine's aggregation surface (SURVEY §2.1 S7-S8 — the
reference's fold+combine model, WindowAggregate.scala:22-31) with the
compressed-state aggregates a 100 TB pipeline leans on.  Both queries
are exact integer algebra over the cross-engine md5 hash, so the
DuckDB oracles reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    bitmap_distinct,
    bitmap_distinct_sql,
    cms_build,
    cms_build_sql,
    cms_estimate,
)
from flink_repartition_watermark_example_spark.functions.hashing import md5_long_sql
from flink_repartition_watermark_example_spark.queries import register_extra
from flink_repartition_watermark_example_spark.sources.tables import load_table


@register_extra(
    "bitmap_distinct_users",
    bitmap_distinct_sql("events", ["event_type"], "user_id", alias="distinct_users"),
    doc="Exact per-type distinct users via bitmap chunks — shuffle "
    "state is one 8-byte chunk per (type, 32-id range), not one row "
    "per event; same answer as distinct_users_by_type at a fraction "
    "of the shuffle at scale.",
)
def q_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bitmap_distinct(
        load_table(spark, sf_dir, "events"),
        ["event_type"],
        "user_id",
        alias="distinct_users",
    )


def _cms_probe_union(depth: int) -> str:
    h = md5_long_sql("CAST(user_id AS VARCHAR)", salt=f"cms{depth}")
    return f"SELECT user_id, {depth} AS depth, ({h}) % {CMS_WIDTH} AS cell FROM cand"


_CMS_ORACLE = f"""
WITH sketch AS ({cms_build_sql("events", "CAST(user_id AS VARCHAR)")}),
cand AS (SELECT DISTINCT user_id FROM events),
probes AS ({" UNION ALL ".join(_cms_probe_union(d) for d in range(CMS_DEPTH))}),
est AS (
    SELECT p.user_id, min(s.n) AS est
    FROM probes p JOIN sketch s ON p.depth = s.depth AND p.cell = s.cell
    GROUP BY p.user_id
)
SELECT user_id, est FROM est
ORDER BY est DESC, user_id
LIMIT 20
"""


@register_extra(
    "cms_heavy_hitters",
    _CMS_ORACLE,
    doc="Top-20 users by count-min-sketch frequency estimate "
    f"(depth {CMS_DEPTH} × width {CMS_WIDTH}).  The sketch is a "
    "fixed-size aggregate built in one scan with map-side partial "
    "counts; candidates broadcast to the probe join.  Estimates are "
    "deterministic integers (md5 hash family), so the oracle matches "
    "exactly — including CMS's one-sided over-count.",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    sketch = cms_build(ev, key)
    cand = ev.select("user_id").distinct()
    est = cms_estimate(sketch, cand, key)
    return est.orderBy(F.col("est").desc(), "user_id").limit(20)


@register_extra(
    "streaming_cms_heavy_hitters",
    _CMS_ORACLE,
    doc="The incremental count-min sketch (streaming/sketch.py) run "
    "THROUGH Structured Streaming and value-checked against the batch "
    "oracle: events replay as three file-batches, each contributing a "
    "versioned delta sketch via foreachBatch; the versions are then "
    "COMPACTED (lossless counter fold) and the estimate runs over the "
    "compacted snapshot.  Because CMS cells are algebraic counters, "
    "sum-of-deltas == one batch sketch, so the exact same DuckDB "
    "oracle as cms_heavy_hitters applies — streamed-in-any-split, "
    "compacted, and batch all agree bit-for-bit.",
)
def q_streaming_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from flink_repartition_watermark_example_spark.streaming.sketch import (
        cms_sketch_writer,
        compact_sketch,
        read_cms_sketch,
    )

    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id", F.col("user_id").cast("string").alias("ukey")
    )

    root = tempfile.mkdtemp(prefix="stream_cms_")
    try:
        src = os.path.join(root, "replay")
        for cond in (
            F.col("event_id") % 3 == 0,
            F.col("event_id") % 3 == 1,
            F.col("event_id") % 3 == 2,
        ):
            keyed.where(cond).coalesce(1).write.mode("append").parquet(src)

        sketch_dir = os.path.join(root, "sketch")
        q = (
            spark.readStream.schema(keyed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.outputMode("append")
            .foreachBatch(cms_sketch_writer(sketch_dir, key_col="ukey"))
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        compact_sketch(spark, sketch_dir)

        # The maintained sketch is O(depth x width) by construction --
        # pull the bounded snapshot local so the returned plan doesn't
        # dangle on the temp dir (same O(1)-index-collect discipline as
        # the ANN index builds).
        sketch = spark.createDataFrame(
            read_cms_sketch(spark, sketch_dir).collect(),
            "depth int, cell bigint, n bigint",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    cand = ev.select("user_id").distinct()
    est = cms_estimate(sketch, cand, F.col("user_id").cast("string"))
    return est.orderBy(F.col("est").desc(), "user_id").limit(20)


@register_extra(
    "streaming_hll_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS streamed_equals_direct,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
    doc="Incremental per-key distinct counting over a stream "
    "(streaming/sketch.py HLL index): events replay as three "
    "file-batches, each writing its per-type HLL sketch as a "
    "versioned delta; versions are compacted (register-max union is "
    "lossless and idempotent) and the estimate runs over the "
    "compacted snapshot.  Contract columns checked per row: the "
    "streamed-and-merged estimate EQUALS the one-shot batch estimate "
    "(any split of the input unions to the same registers), and the "
    "5% bound vs exact distinct.  Bounded state: one fixed-size "
    "sketch per key regardless of stream length.",
)
def q_streaming_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from flink_repartition_watermark_example_spark.streaming.sketch import (
        compact_hll_sketch,
        hll_sketch_writer,
        read_hll_sketch,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    root = tempfile.mkdtemp(prefix="stream_hll_")
    try:
        src = os.path.join(root, "replay")
        for cond in (
            F.col("event_id") % 3 == 0,
            F.col("event_id") % 3 == 1,
            F.col("event_id") % 3 == 2,
        ):
            ev.where(cond).coalesce(1).write.mode("append").parquet(src)

        sketch_dir = os.path.join(root, "sketch")
        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.outputMode("append")
            .foreachBatch(
                hll_sketch_writer(sketch_dir, key_col="user_id", group_col="event_type")
            )
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        compact_hll_sketch(spark, sketch_dir, "event_type")

        # one fixed-size sketch per key — bounded snapshot, pulled
        # local so the returned plan doesn't dangle on the temp dir
        merged = spark.createDataFrame(
            read_hll_sketch(spark, sketch_dir, "event_type").collect(),
            "event_type string, sk binary",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    streamed = merged.select(
        "event_type", F.hll_sketch_estimate("sk").alias("streamed_users")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_users"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
    )
    return streamed.join(direct, "event_type").select(
        "event_type",
        "exact_users",
        (F.col("streamed_users") == F.col("direct_users")).alias(
            "streamed_equals_direct"
        ),
        (
            F.abs(F.col("streamed_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("within_5pct"),
    )


@register_extra(
    "hll_daily_rollup_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS merged_equals_direct,
           TRUE AS merged_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="Two-level mergeable-sketch rollup — the incremental pattern "
    "that makes sketches matter at 100 TB: per-(day, type) HLL "
    "sketches are built in one scan (hll_sketch_agg — what a daily "
    "job would persist as a binary column), then hll_union_agg merges "
    "the stored sketches to per-type totals WITHOUT rescanning raw "
    "events.  Contracts checked per row: (a) the merged estimate "
    "EQUALS the direct single-pass estimate — HLL union at equal "
    "lgConfigK is lossless, register-wise max, so re-aggregation "
    "costs zero accuracy by construction; (b) the 5% error bound vs "
    "exact distinct, as in approx_distinct_users_sketch (~1.6% rsd "
    "at lgConfigK=12).  Sketch internals are engine-specific bits, so "
    "like the other sketch entries the oracle asserts the contract "
    "columns, not the registers.",
)
def q_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_users")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_users"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        "exact_users",
        (F.col("merged_users") == F.col("direct_users")).alias(
            "merged_equals_direct"
        ),
        (
            F.abs(F.col("merged_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("merged_within_5pct"),
    )
