"""The per-dim |x|-max index: stream==batch in any order, IDEMPOTENT
under duplicated replays (the max-merge guarantee the additive
counters cannot make), compact-safe, empty-batch no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.functions.vectors import as_double
from flink_repartition_watermark_example_spark.sources.tables import load_table
from flink_repartition_watermark_example_spark.streaming.int8scale import (
    compact_scales,
    dim_max_writer,
    read_dim_scales,
)


def _batch_scales(emb):
    return {
        r["j"]: r["s"]
        for r in emb.select(
            F.posexplode(as_double("embedding")).alias("j0", "x")
        )
        .select((F.col("j0") + 1).cast("long").alias("j"), F.abs("x").alias("ax"))
        .groupBy("j")
        .agg((F.max("ax") / F.lit(127.0)).alias("s"))
        .collect()
    }


def _read(spark, d):
    return {r["j"]: r["s"] for r in read_dim_scales(spark, d).collect()}


def test_unordered_splits_equal_batch_and_idempotent_replay(
    spark, sf_dir, tmp_path
):
    emb = load_table(spark, sf_dir, "embeddings")
    want = _batch_scales(emb)
    d = str(tmp_path / "idx")
    w = dim_max_writer(d)
    # deliberately NOT id-ordered splits
    splits = [
        emb.where(F.col("vec_id") % 3 == 2),
        emb.where(F.col("vec_id") % 3 == 0),
        emb.where(F.col("vec_id") % 3 == 1),
    ]
    for i, s in enumerate(splits):
        w(s, i)
    assert _read(spark, d) == want

    # duplicated replay UNDER A FRESH VERSION (not the replay-skip
    # path — a genuinely doubled delta): max idempotence keeps the
    # merged scales bit-identical, where a counter index would drift
    w(splits[0], 7)
    assert _read(spark, d) == want


def test_empty_batch_publishes_nothing(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    d = str(tmp_path / "idx")
    w = dim_max_writer(d)
    w(emb.where(F.lit(False)), 0)
    assert not os.path.exists(os.path.join(d, "v0"))
    assert read_dim_scales(spark, d).count() == 0


def test_compaction_is_lossless_and_skips_replayed_batches(
    spark, sf_dir, tmp_path
):
    emb = load_table(spark, sf_dir, "embeddings")
    want = _batch_scales(emb)
    d = str(tmp_path / "idx")
    w = dim_max_writer(d)
    for i, cond in enumerate([F.col("vec_id") % 2 == 0, F.col("vec_id") % 2 == 1]):
        w(emb.where(cond), i)
    removed = compact_scales(spark, d)
    assert removed == 1
    assert _read(spark, d) == want
    # a pre-compaction batch replay is skipped by the marker
    w(emb.where(F.col("vec_id") % 2 == 0), 0)
    assert _read(spark, d) == want


def test_streaming_replay_query_matches_batch(spark, sf_dir):
    from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES

    emb = load_table(spark, sf_dir, "embeddings")
    want = _batch_scales(emb)
    got = {
        r["j"]: r["s"]
        for r in EXTRA_QUERIES["streaming_int8_scales"].spark(spark, sf_dir).collect()
    }
    assert got == want
