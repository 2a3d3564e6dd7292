"""Run EVERY registered batch query once at the generated sf1 and
report per-query wall time — the blunt instrument that catches what
the plan audit structurally cannot.

The plan audit (tests/test_plan_audit.py) rejects forbidden SHAPES
(cartesian, nested-loop, row-Python); this sweep catches legal shapes
with degenerate CONSTANTS, which only show up when the data grows:

- round 4 finds: simhash_neardup_pairs had an uncapped band bucket
  (near-empty docs all hash to ~0 → one quadratic bucket);
  fuzzy_name_pairs blocked on a zero-entropy name prefix (one block
  held 2/3 of all customers); repetition_signals ran O(distinct ×
  tokens) interpreted lambdas on a single scan split.

Usage: python scripts/sweep_scale.py [--sf1 .scaledata/sf1]
       [--slow-threshold 15]
Exit code 1 if any query fails or exceeds the slow threshold, so the
sweep can gate a round.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_repartition_watermark_example_spark import get_spark
from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES, QUERIES

# iterative driver-loop operators are covered (with ratios) by
# scale_check.py; excluded here to keep the sweep fast.
# embedding_neardup_pairs keeps its gate-sized 16-bucket index —
# scale_check records the 8-plane variant that IS the scale path.
SKIP = {
    "kmeans_centroids",
    "ivf_trained_topk",
    "bpe_merges",
    "bpe_encode_token_counts",  # trains bpe_merges' loop before encoding
    "neardup_clusters",
    "embedding_neardup_pairs",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default=os.path.join(REPO, ".scaledata", "sf1"))
    ap.add_argument("--slow-threshold", type=float, default=15.0)
    args = ap.parse_args()
    if not os.path.isdir(args.sf1):
        raise SystemExit(f"{args.sf1} missing — run scripts/gen_scale.py first")

    spark = get_spark(app_name="sweep-scale")
    all_queries = {**QUERIES, **EXTRA_QUERIES}
    names = [
        n
        for n in all_queries
        if not n.startswith("streaming_") and n not in SKIP
    ]
    slow, failed = [], []
    for name in names:
        t0 = time.perf_counter()
        try:
            all_queries[name].spark(spark, args.sf1).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            flag = "  <-- SLOW" if dt > args.slow_threshold else ""
            print(f"{dt:8.1f}s  {name}{flag}", flush=True)
            if dt > args.slow_threshold:
                slow.append((name, round(dt, 1)))
        except Exception as e:  # noqa: BLE001 — report and continue
            failed.append((name, str(e)[:200]))
            print(f"    FAIL  {name}: {str(e)[:150]}", flush=True)
        # isolate queries from each other (see scale_check.run_one):
        # persisted shared stages otherwise tax whatever runs next
        import gc

        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    print(f"\nswept {len(names)} queries; slow: {slow or 'none'}; "
          f"failed: {failed or 'none'}")
    if slow or failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
