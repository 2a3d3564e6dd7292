"""Sketch-family invariants beyond the oracle compare:
bitmap distinct is EXACT, count-min error is one-sided."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators.sketch import (
    bitmap_distinct,
    cms_build,
    cms_estimate,
)
from flink_repartition_watermark_example_spark.sources.tables import load_table


def test_bitmap_distinct_equals_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["d"]
        for r in bitmap_distinct(ev, ["event_type"], "user_id", alias="d").collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert got == exact


def test_cms_never_undercounts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    sketch = cms_build(ev, key)
    cand = ev.select("user_id").distinct()
    est = {r["user_id"]: r["est"] for r in cms_estimate(sketch, cand, key).collect()}
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact)
    for uid, n in exact.items():
        assert est[uid] >= n, f"CMS undercounted user {uid}: {est[uid]} < {n}"
