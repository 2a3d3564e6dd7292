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
    # embeds the filtered-corpus cosine_topk as its exact side
    "ann_recall_filtered",
    # same recall family at the production probe width — embeds
    # cosine_topk (the bounded 10-query broadcast) as its exact side
    "ann_recall_ivf_production",
    # broadcast of the single-row (n_pos, tot_pos) balance aggregate
    # onto customer (queries_subqueries.py)
    "rich_inactive_customers",
    # broadcast of the single-row n_docs corpus-stats aggregate onto
    # the (doc, term) tf relation (queries_text.py, the bm25 shape)
    "tfidf_top_terms",
    # broadcast of the single-row (n_uni, n_bg) totals aggregate onto
    # the bigram count table (queries_text.py)
    "bigram_lift",
    # broadcast of the single-row corpus-total aggregate onto the
    # (source, token) count table and the O(sources) output relation
    # (queries_text.py, round 12)
    "source_token_divergence",
    # broadcast of the single-row (total, n_parts) aggregate onto the
    # per-part value relation — the Q11 HAVING-scalar decorrelation
    # (queries_subqueries.py)
    "important_part_values",
    # broadcast of the O(k)-row centroid RELATION onto the vector
    # corpus — the deliberate join-based SemDeDup assignment tier
    # (operators/similarity.py assign_by_join): k is bounded by
    # SEMDEDUP_BROADCAST_BYTES (the operator refuses flat assignment
    # past it), so the broadcast side is never data-scale
    "semantic_dedup_joined",
    # same assign_by_join tier feeding the cluster-size histogram
    "semantic_cluster_sizes",
    # embeds cosine_topk (the 10-query broadcast brute-force baseline)
    # as its positives side
    "hard_negative_mining",
    # broadcast joins BETWEEN single-row aggregate relations: each
    # constraint metric is one row (per-table conditional agg × the
    # LeftSemi RI count), so every nested-loop input is exactly one
    # row at any corpus size (queries_quality.py, round 12)
    "dq_constraint_report",
    # single-row moment aggregate × single-row TakeOrdered(10) sum —
    # both sides O(1) rows by construction (queries_quality.py)
    "key_skew_report",
}


# Partition-less WindowExec funnels its entire input through ONE task
# (Spark's contract for a window with no PARTITION BY) — the silent
# single-task bottleneck class (the old pack_chunks_into_sequences
# plan).  Allowed only where the windowed relation is provably
# bounded, never data-scale:
GLOBAL_WINDOW_ALLOWED = {
    # window over the O(#sources) aggregate, ~20 rows at any SF
    # (queries_text.py: training_mix_weights)
    "training_mix_weights",
    # rank over the top-N bm25 result: the window's input is a
    # TakeOrderedAndProject(limit=20) — O(topN) rows (queries_text.py)
    "bm25_search",
    # ntile is inherently global; documented extra whose at-scale
    # substitute (approx-percentile cutpoints + bucket join) exists
    # (queries_catalog.py:~1231)
    "ntile_price_quartiles",
    # two-level prefix sum: the only global windows run over the
    # 256-row shard-total relation (top-8-bits-of-hash shards), O(256)
    # at any corpus size; the per-cluster cumsum is hash-partitioned
    # (queries_dedup.py: split_by_cluster_balanced)
    "split_by_cluster_balanced",
}


def _physical_nodes(jplan):
    """DFS over a physical plan's JVM tree.  AdaptiveSparkPlanExec and
    query-stage wrappers are LEAF nodes whose real plan hangs off an
    accessor, not children() — without unwrapping them the walk sees
    nothing and the guard silently passes everything."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        yield node
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(node.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(node.plan())
            continue
        it = node.children().iterator()
        while it.hasNext():
            stack.append(it.next())


def _unpartitioned_windows(df) -> list[str]:
    """Simple names of Window-style physical nodes whose partitionSpec
    is empty — each one is a single-task global sort at runtime."""
    hits = []
    for node in _physical_nodes(df._jdf.queryExecution().executedPlan()):
        cls = node.getClass().getSimpleName()
        if cls in ("WindowExec", "WindowGroupLimitExec", "WindowInPandasExec"):
            if node.partitionSpec().isEmpty():
                hits.append(cls)
    return hits


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
    if name not in GLOBAL_WINDOW_ALLOWED:
        bad = _unpartitioned_windows(df)
        assert not bad, (
            f"{name}: partition-less {bad} — the whole input funnels "
            f"through one task; add a shard key to PARTITION BY or "
            f"allowlist with a boundedness argument\n{plan[:1500]}"
        )


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Scale guard: for a selective dim filter feeding a non-broadcast
    fact join, Catalyst's InjectRuntimeFilter must plant a
    might_contain(bloom_filter_agg(dim keys)) predicate on the fact
    scan — the runtime semi-join pruning that, at 100 TB, keeps the
    shuffle from carrying fact rows that can never match.  The local
    thresholds only shrink the size gates; the rewrite itself is the
    stock rule a production cluster runs with defaults."""
    from pyspark.sql import functions as F

    from flink_repartition_watermark_example_spark.sources.tables import load_table

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # local parquet is KB-scale; production fact tables pass the
        # 10 GB default on their own
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        o = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        l = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        j = l.join(o, l.l_orderkey == o.o_orderkey).agg(
            F.sum("l_quantity").alias("s")
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt and "bloom_filter_agg" in opt, (
            f"runtime bloom filter not injected\n{opt[:1500]}"
        )
        # and the rewrite preserves the answer vs the plain plan
        [(pruned,)] = j.collect()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    [(plain,)] = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .agg(F.sum("l_quantity").alias("s"))
        .collect()
    )
    assert pruned == plain


def test_q6_predicates_and_projection_reach_the_scan(spark, sf_dir):
    """forecast_revenue_change's whole value at 100 TB is that all
    three predicates land in PushedFilters (row-group pruning) and
    the scan reads 4 of lineitem's 11 columns — pin both."""
    df = ALL["forecast_revenue_change"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan"):]
    pushed = scan[scan.index("PushedFilters"):].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    read_schema = scan[scan.index("ReadSchema"):].split(">", 1)[0]
    want = {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    got = {c for c in want if c in read_schema}
    assert got == want, read_schema
    # and nothing else: 4 columns exactly (count field colons inside
    # the struct, not the "ReadSchema:" label's own colon)
    struct_body = read_schema.split("struct<", 1)[1]
    assert struct_body.count(":") == len(want), read_schema
