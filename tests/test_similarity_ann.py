"""ANN quality contracts: both approximate paths (LSH multi-probe,
IVF-flat) must return genuinely similar vectors — validated against
the exact brute-force baseline — and be internally consistent."""

from __future__ import annotations

from flink_repartition_watermark_example_spark.operators import similarity as SIM
from flink_repartition_watermark_example_spark.sources.tables import load_table


def _topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cos_sim"]))
    return {q: sorted(v) for q, v in out.items()}


def test_ann_paths_recall_against_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = _topk_map(SIM.cosine_topk(emb))
    for approx_df in (SIM.lsh_ann_topk(emb), SIM.ivf_topk(emb)):
        approx = _topk_map(approx_df)
        assert set(approx) == set(exact), "every query must get results"
        hits = total = 0
        for q in exact:
            exact_ids = {vid for _, vid, _ in exact[q]}
            approx_ids = {vid for _, vid, _ in approx[q]}
            assert len(approx_ids) <= 5
            # approximate scores can never exceed the exact best
            assert max(s for _, _, s in approx[q]) <= max(
                s for _, _, s in exact[q]
            ) + 1e-12
            hits += len(exact_ids & approx_ids)
            total += len(exact_ids)
        # random-hyperplane/IVF recall on 64-d synthetic data is modest
        # by construction; the contract is "well above chance", not
        # parity (chance ≈ k/corpus ≈ 1%).
        assert hits / total > 0.15, f"recall {hits/total:.2f} barely above chance"


def test_ivf_assignment_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, SIM.ivf_topk(emb).collect()))
    b = sorted(map(tuple, SIM.ivf_topk(emb).collect()))
    assert a == b
