"""Same-table multi-scan audit over every registered batch query.

Counts how many times each source parquet file appears in a query's
EXECUTED plan (the optimized logical plan's Relation nodes don't print
paths).  This is the diagnostic that caught two real wastes in round 9:
source_overlap_matrix's fingerprint self-join reading the corpus twice
(rewritten group-then-expand: one scan, measured faster) and
cdc_apply_orders' synthetic changeset scanning orders 9x (rewritten as
a scan-side explode: 3 scans).

CAVEATS — a high count is a LEAD, not a verdict:
- Persisted relations reprint their full lineage inside
  InMemoryRelation nodes, so pinned dedup funnels (neardup chain,
  semantic dedup) count many "scans" that never execute.
- Two scans of one table with DIFFERENT pushed filters (ANN query
  rows vs corpus rows, TPC-H nation-as-two-roles) are the optimal
  plan, not waste.
- The actionable pattern is the SAME unfiltered projection appearing
  on both sides of a join/union that Catalyst doesn't reuse.
- Confirm a hit by EXECUTING the query and checking the plan for
  ReusedExchange / InMemoryTableScan before rewriting anything:
  round 9's remaining hits (simhash band self-join, bm25's shared
  stats, boilerplate's inventory) all turned out reused or pinned —
  Catalyst reuses an exchange when both sides shuffle the identical
  subplan (the simhash bucket-cap window conveniently forces exactly
  that shuffle), so only joins whose sides DON'T already share an
  exchange re-execute their input.

Usage: python scripts/scan_audit.py [--sf-dir /root/testdata/sf0.001]
           [--threshold 2]
Prints one line per query at/above the threshold; exits 0 always
(diagnostic, not a gate).
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_repartition_watermark_example_spark import get_spark
from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES, QUERIES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--threshold", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    pat = re.compile(r"/(\w+)\.parquet")
    all_queries = {**QUERIES, **EXTRA_QUERIES}
    for name, q in all_queries.items():
        if name.startswith("streaming_"):
            continue
        try:
            df = q.spark(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — diagnostic, keep going
            print(f"ERR   {name}: {str(e)[:80]}", flush=True)
            continue
        counts = collections.Counter(pat.findall(plan))
        dups = {t: c for t, c in counts.items() if c >= args.threshold}
        if dups:
            print(f"MULTI {name}: {dups}", flush=True)


if __name__ == "__main__":
    main()
