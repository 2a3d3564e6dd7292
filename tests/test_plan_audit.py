"""Repo-wide physical-plan audit: the whole registry must stay inside
the 100 TB-safe envelope.

Checked for EVERY registered batch query (primary + extras):

- no CartesianProduct — an unkeyed pair blowup never survives scale;
- no BroadcastNestedLoopJoin except the one documented case
  (cosine_topk's exact-baseline crossJoin of a broadcast 10-row query
  set — the two ANN paths beside it are the scale story);
- no BatchEvalPython / row-at-a-time Python UDF — Python only at the
  Arrow boundary (ArrowEvalPython / mapInPandas are the allowed
  shapes).

Streaming queries are excluded: invoking them executes a full replay
(they are audited by their own tests); this audit is analysis-only and
builds each plan without running it.
"""

from __future__ import annotations

import pytest

from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES, QUERIES

ALL = {**QUERIES, **EXTRA_QUERIES}
# Iterative driver-loop queries EXECUTE their loop when the plan is
# built — minute-class, so they join the slow tier; the audit still
# covers them in the full run.
_ITERATIVE = {"neardup_clusters", "kmeans_centroids", "bpe_merges",
              "pagerank_suppliers", "ivf_trained_topk"}
BATCH = [
    pytest.param(n, marks=pytest.mark.slow) if n in _ITERATIVE else pytest.param(n)
    for n in ALL
    if not n.startswith("streaming_")
]

# Nested-loop joins allowed only where the build side is O(1) rows:
# - cosine_topk: documented exact-baseline broadcast crossJoin of the
#   10-row query set (operators/similarity.py);
# - bm25_search: broadcast of the single-row corpus-stats aggregate
#   (N, total_dl) onto the posting list;
# - ann_recall_*: embed cosine_topk as the exact side of the recall
#   intersection, inheriting its allowed shape.
NESTED_LOOP_ALLOWED = {
    "cosine_topk",
    "bm25_search",
    "ann_recall_lsh",
    "ann_recall_ivf",
    "ann_recall_pq",
    # broadcast of the single-row (n_pos, tot_pos) balance aggregate
    # onto customer (queries_subqueries.py)
    "rich_inactive_customers",
}


@pytest.mark.parametrize("name", BATCH)
def test_plan_stays_in_scale_envelope(spark, sf_dir, name):
    df = ALL[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan[:1500]}"
    if name not in NESTED_LOOP_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join\n{plan[:1500]}"
        )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan\n{plan[:1500]}"
    )
