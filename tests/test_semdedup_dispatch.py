"""Auto-tiered SemDeDup dispatch (VERDICT r11 #1): the registered
semantic_dedup_joined gate query picks its assignment tier from the
pair-row (n*k) cost model instead of asking the user to know the
regime map.  Below SEMDEDUP_PAIRROW_BUDGET it is the flat joined tier
(what every oracle-compared SF runs); above it, assignment routes
through the fully-relational two-level router and the result is
bit-identical to the registered semantic_dedup_hier family."""

from __future__ import annotations

import pytest

from flink_repartition_watermark_example_spark.operators import similarity as SIM
from flink_repartition_watermark_example_spark.queries_similarity import (
    q_semantic_dedup_hier,
    q_semantic_dedup_joined,
)
from flink_repartition_watermark_example_spark.sources.tables import load_table

SF_001 = "/root/testdata/sf0.001"
SF_01 = "/root/testdata/sf0.01"


def _survivors(df):
    return sorted((r["vec_id"], r["list_id"]) for r in df.collect())


def test_default_budget_keeps_the_flat_joined_tier(spark, sf_dir):
    """At every oracle-compared SF the dispatch lands on the flat
    joined tier — the registered query's rows equal the flat operator
    called directly, so the existing flat oracle SQL stays the exact
    description of what the driver hash-checks."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = _survivors(
        SIM.semantic_dedup_joined(emb, SIM.scaled_centroids_df(emb))
    )
    dispatched = _survivors(q_semantic_dedup_joined(spark, sf_dir))
    assert dispatched == flat
    assert dispatched, "expected survivors"


@pytest.mark.parametrize(
    "dir_",
    [SF_001, pytest.param(SF_01, marks=pytest.mark.slow)],
)
def test_routed_tier_is_bit_identical_to_hier_family(spark, monkeypatch, dir_):
    """Force the budget to zero: the dispatcher must route through
    semantic_dedup_two_level_joined, and the result must be
    BIT-IDENTICAL to the registered semantic_dedup_hier query (the
    closure-path router) — i.e. above the budget the gate query's
    semantics are exactly the hier family's hash-exact oracle CTEs.
    Two SFs so the equality covers more than one k/component shape."""
    monkeypatch.setattr(SIM, "SEMDEDUP_PAIRROW_BUDGET", 0)
    routed = _survivors(q_semantic_dedup_joined(spark, dir_))
    hier = _survivors(q_semantic_dedup_hier(spark, dir_))
    assert routed == hier
    assert routed, "expected survivors"


def test_dispatch_boundary_is_exactly_the_budget(spark, sf_dir, monkeypatch):
    """n*k == budget stays flat; budget - 1 routes.  Observed through
    which operator the dispatcher invokes, so the test pins the
    boundary arithmetic itself, not a scale-dependent side effect."""
    emb = load_table(spark, sf_dir, "embeddings")
    _, k, n = SIM.scaled_centroid_plan(emb)
    calls = []
    real_flat = SIM.semantic_dedup_joined
    real_routed = SIM.semantic_dedup_two_level_joined
    monkeypatch.setattr(
        SIM,
        "semantic_dedup_joined",
        lambda *a, **kw: calls.append("flat") or real_flat(*a, **kw),
    )
    monkeypatch.setattr(
        SIM,
        "semantic_dedup_two_level_joined",
        lambda *a, **kw: calls.append("routed") or real_routed(*a, **kw),
    )
    monkeypatch.setattr(SIM, "SEMDEDUP_PAIRROW_BUDGET", n * k)
    SIM.semantic_dedup_dispatch(emb)
    monkeypatch.setattr(SIM, "SEMDEDUP_PAIRROW_BUDGET", n * k - 1)
    SIM.semantic_dedup_dispatch(emb)
    assert calls == ["flat", "routed"]


def test_flat_operator_refuses_past_the_pairrow_budget(spark, sf_dir, monkeypatch):
    """Direct callers of the flat tier (bypassing the dispatcher) get
    a loud refusal instead of the killed round-11 sweep shape — the
    pair-row guard joins the broadcast-bytes guard."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent, k, n = SIM.scaled_centroid_plan(emb)
    monkeypatch.setattr(SIM, "SEMDEDUP_PAIRROW_BUDGET", n * k - 1)
    with pytest.raises(ValueError, match="pair-row budget"):
        SIM.semantic_dedup_joined(emb, cent, expected_k=k, expected_n=n)
