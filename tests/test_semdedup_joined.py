"""Join-based SemDeDup assignment tier (VERDICT r9 #2): the centroid
set stays a RELATION end-to-end — broadcast exchange into a fold-exact
per-candidate-row kernel — with NO O(k) driver collect, and produces
bit-identical survivors to the closure path."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators import similarity as SIM
from flink_repartition_watermark_example_spark.sources.tables import load_table


def _survivors(df):
    return sorted((r["vec_id"], r["list_id"]) for r in df.collect())


def test_joined_tier_is_bit_identical_to_closure_tier(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    closure = _survivors(
        SIM.semantic_dedup(emb, centroid_ids=SIM.scaled_centroid_ids(emb))
    )
    joined = _survivors(
        SIM.semantic_dedup_joined(emb, SIM.scaled_centroids_df(emb))
    )
    assert closure == joined
    assert closure, "expected survivors"


def test_two_level_joined_is_bit_identical_to_closure_two_level(spark, sf_dir):
    """The fully-relational router (broadcast Lloyd-mean supers,
    shuffled child equi-join, struct-max argmaxes) reproduces the
    closure-path two-level assignment bit-for-bit — the k>=1e5
    recorder (scripts/record_semdedup_hier_k.py) runs THIS form."""
    emb = load_table(spark, sf_dir, "embeddings")
    ids = SIM.scaled_centroid_ids(emb)
    closure = _survivors(
        SIM.semantic_dedup_two_level(emb, centroid_ids=ids, nprobe=2)
    )
    joined = _survivors(
        SIM.semantic_dedup_two_level_joined(
            emb, SIM.scaled_centroids_df(emb), nprobe=2
        )
    )
    assert closure == joined
    assert closure


def test_joined_assignment_plan_broadcasts_the_centroid_relation(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    vectors = SIM.fan_out(emb, "vec_id").select(
        "vec_id", SIM.as_double("embedding").alias("v")
    )
    plan = (
        SIM.assign_by_join(vectors, SIM.scaled_centroids_df(emb))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan, plan[:1500]
    # the argmax is an aggregate with a map-side partial (struct max
    # compiles to SortAggregate — partial_max runs BEFORE the vec_id
    # exchange, so only n rows shuffle), never a window sort that
    # would shuffle all n*k candidate rows
    assert "partial_max" in plan, plan[:1500]
    assert "WindowExec" not in plan, plan[:1500]


def test_above_threshold_tier_never_collects_centroid_ids(
    spark, sf_dir, monkeypatch
):
    """Force the k > closure_k_max branch and prove it works with the
    O(k) id collect PHYSICALLY unavailable: scaled_centroid_ids is
    monkeypatched to raise.  per_cluster=20 puts sf0.001's 500 vectors
    at k=25 > closure_k_max=16, and the result must still match the
    closure tier run with the same explicit centroid set."""
    from flink_repartition_watermark_example_spark import queries_similarity as QS

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    per_cluster = max(1, n // 25)
    k = max(16, n // per_cluster)
    assert k > 16

    want_ids = [
        r["vec_id"]
        for r in emb.where(F.col("vec_id") >= 10)
        .select("vec_id")
        .orderBy("vec_id")
        .limit(k)
        .collect()
    ]
    expected = _survivors(SIM.semantic_dedup(emb, centroid_ids=want_ids))

    def boom(*a, **kw):
        raise AssertionError("O(k) driver collect above the closure tier")

    monkeypatch.setattr(SIM, "scaled_centroid_ids", boom)
    got = _survivors(
        QS._scaled_semantic_dedup(
            spark, sf_dir, per_cluster=per_cluster, closure_k_max=16
        )
    )
    assert got == expected


def test_joined_tier_refuses_beyond_broadcast_ceiling(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    too_big = SIM.SEMDEDUP_BROADCAST_BYTES // (SIM.EMBED_DIM * 8) + 1
    with pytest.raises(ValueError, match="two_level"):
        SIM.semantic_dedup_joined(
            emb, SIM.scaled_centroids_df(emb), expected_k=too_big
        )


def test_exact_kth_smallest_matches_sorted_rank(spark):
    rng = random.Random(7)
    # sparse, strided, shuffled ids — the gen_scale id shape that
    # banned rank-by-arithmetic
    vals = rng.sample(range(0, 10_000_000), 3000)
    df = spark.createDataFrame([(v,) for v in vals], "vec_id long")
    ordered = sorted(vals)
    for k in (1, 2, 17, 500, 1500, 3000):
        got = SIM.exact_kth_smallest(
            df, "vec_id", k, buckets=16, direct_limit=64
        )
        assert got == ordered[k - 1], k
    with pytest.raises(ValueError):
        SIM.exact_kth_smallest(df, "vec_id", 0)
    with pytest.raises(ValueError):
        SIM.exact_kth_smallest(df, "vec_id", 3001)


def test_scaled_centroids_df_clamps_k_to_eligible_count(spark):
    """ADVICE r10: on degenerate inputs (per_cluster small enough that
    max(16, n // per_cluster) exceeds the eligible count) the id-list
    twin truncates via limit(k) while the relational tier used to
    crash in the rank cut — both must derive the IDENTICAL set."""
    rows = [(i, [float(i % 7), 1.0]) for i in range(5, 25)]  # 20 rows, ids 5..24
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # eligible = ids >= 10 → 15 rows; per_cluster=1 → k = max(16, 20) = 20 > 15
    ids = SIM.scaled_centroid_ids(emb, per_cluster=1)
    got = sorted(
        r["centroid_id"]
        for r in SIM.scaled_centroids_df(emb, per_cluster=1).collect()
    )
    assert got == sorted(ids)
    assert len(got) == 15


def test_scaled_centroids_df_empty_eligible_set(spark):
    emb = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    assert SIM.scaled_centroids_df(emb).count() == 0
    assert SIM.scaled_centroid_ids(emb) == []


def test_grouped_purge_bit_identical_to_pair_join_path(spark, sf_dir):
    """r13: _purge_within_lists moved from the list_id pair self-join +
    _score_pairs + anti-join to ONE grouped kernel per cluster.  The
    survivor set must equal the old path's exactly — same fold-order
    cosines, same >= threshold cut, lower-id representative wins."""
    from pyspark.sql import functions as F

    from flink_repartition_watermark_example_spark.operators.similarity import (
        _purge_within_lists,
        _score_pairs,
        closure_assignment,
    )
    from flink_repartition_watermark_example_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = closure_assignment(emb).persist()
    assigned.count()
    try:
        # the pre-r13 pair-join purge, verbatim
        a, b = assigned.alias("a"), assigned.alias("b")
        pairs = a.join(
            b,
            (F.col("a.list_id") == F.col("b.list_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("query_id"),
            F.col("a.v").alias("qv"),
            F.col("a.nv").alias("nqv"),
            F.col("b.vec_id").alias("vec_id"),
            F.col("b.v").alias("v"),
            F.col("b.nv").alias("nv"),
        )
        purged = (
            _score_pairs(pairs)
            .where(F.col("cos_sim") >= 0.25)
            .select("vec_id")
            .dropDuplicates()
        )
        old = {
            (r["vec_id"], r["list_id"])
            for r in assigned.join(purged, "vec_id", "left_anti")
            .select("vec_id", "list_id")
            .collect()
        }
        new = {
            (r["vec_id"], r["list_id"])
            for r in _purge_within_lists(assigned, 0.25).collect()
        }
        assert new == old
        assert new  # non-degenerate
    finally:
        assigned.unpersist()
