"""Record the COLD cluster_build cost per scale dir as a sweep
recorder key (round 12).

Since cluster_build memoizes the pair pipeline + CC per (session, dir)
and scale_check's run_one takes the min of 2 reps, the split-family
sweep rows now measure the MARGINAL consumer cost (the production
materialize-once shape) — the build's own scale behavior would
otherwise drop out of the artifacts.  This script times the first
(cold) build per dir in a fresh session and merges
``cluster_build_sec`` into the corresponding sweep artifact, next to
the other recorder keys (semdedup_scaled_k discipline: merge into an
existing artifact, never overwrite).

Usage: python scripts/record_cluster_build.py OUT_JSON DIR [DIR ...]
e.g.:  python scripts/record_cluster_build.py BENCH_sf10.json \\
           /root/repo/.scaledata/sf1 /root/repo/.scaledata/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_repartition_watermark_example_spark import get_spark
from flink_repartition_watermark_example_spark.queries_dedup import cluster_build


def main() -> None:
    out, dirs = sys.argv[1], sys.argv[2:]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")
    spark = get_spark(app_name="cluster-build-recorder")
    spark.range(1000).selectExpr("sum(id)").collect()
    rows: dict[str, dict] = {}
    for d in dirs:
        key = os.path.basename(os.path.normpath(d))
        t0 = time.perf_counter()
        b = cluster_build(spark, d)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        cluster_build(spark, d)  # memo hit — the consumer-visible cost
        warm = time.perf_counter() - t0
        rows[key] = {
            "cold_sec": round(cold, 3),
            "memo_sec": round(warm, 4),
            "n_pairs": b.pairs["simhash"].count(),
            "n_docs": b.clusters.count(),
        }
        print(f"{key}: cold={cold:.2f}s memo={warm:.4f}s", flush=True)
    with open(out) as f:
        artifact = json.load(f)
    artifact["cluster_build_sec"] = rows
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps({"metric": "cluster_build_recorded", "dirs": list(rows)}))


if __name__ == "__main__":
    main()
