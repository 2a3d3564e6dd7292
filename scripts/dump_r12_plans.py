"""Dump .explain('formatted') for the round-12 optimization targets.

Usage: python scripts/dump_r12_plans.py <suffix> [outdir]
Writes <outdir>/<query>_<suffix>.txt for each target query, running
from whatever repo copy is first on sys.path (so a worktree checkout
of the pre-optimization commit produces the *_before.txt set).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_repartition_watermark_example_spark import get_spark  # noqa: E402
from flink_repartition_watermark_example_spark.queries import (  # noqa: E402
    EXTRA_QUERIES,
    QUERIES,
)

# Queries whose plans changed (or whose upstream pinning changed) in
# the round-12 optimization pass.  The streaming replays are excluded:
# their work happens inside foreachBatch bodies (per-phase timings in
# OPTIMIZATION_r12.md are the evidence there), and the returned
# DataFrame is just the snapshot read.
TARGETS = [
    "neardup_triangles",
    "split_leakage_cross_family",
    "cluster_map_staleness",
    "contrastive_pairs",
    "dedup_audit_sample",
    "split_leakage_audit",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "neardup_purged_docs",
    "ann_recall_ivf_trained_production",
    "ivf_trained_topk",
    "neardup_clusters",
    "split_by_cluster",
    "ann_recall_ivf_production",
    "ann_recall_filtered",
]


def main() -> None:
    suffix = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"r12-plans-{suffix}")
    for name in TARGETS:
        q = QUERIES.get(name) or EXTRA_QUERIES.get(name)
        if q is None:
            print(f"skip {name}: not registered here", flush=True)
            continue
        try:
            df = q.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {exc!r}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
