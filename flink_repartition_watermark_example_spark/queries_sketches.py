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
