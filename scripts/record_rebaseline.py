"""Isolated re-baseline of noisy bench rows (VERDICT r12 #7): run the
named queries alone — fresh session, quiet box, N isolated reps with
the bench's own one-rep methodology (noop sink, clearCache+gc between
reps) — and merge the medians/spreads into BENCH_local.json under
``isolated_rebaseline`` (a recorder key bench.py preserves, like
decode_pregate).  Use when a row's driver/builder medians disagree
with spreads to match: the isolated run separates the query's real
cost from bench-order and box-load artifacts.

Usage: python scripts/record_rebaseline.py [reps] [names...]
Defaults: 5 reps; the three r12 disagreement rows.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_repartition_watermark_example_spark import get_spark
from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES, QUERIES

DEFAULT_NAMES = [
    "hard_negative_mining",
    "streaming_cms_heavy_hitters",
    "span_dedup_stats",
]


def main() -> None:
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 5
    names = (args[1:] if args and args[0].isdigit() else args) or DEFAULT_NAMES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="rebaseline")
    spark.range(1000).selectExpr("sum(id)").collect()
    from flink_repartition_watermark_example_spark.datamodel import TABLES
    from flink_repartition_watermark_example_spark.sources.tables import load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()

    out: dict = {}
    for name in names:
        q = QUERIES.get(name) or EXTRA_QUERIES[name]
        runs = []
        for _ in range(reps + 1):  # rep 0 is warmup, excluded
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        core = runs[1:]
        out[name] = {
            "median": round(statistics.median(core), 4),
            "spread": round(max(core) - min(core), 4),
            "reps": reps,
            "rep0_cold": round(runs[0], 4),
        }
        print(f"{name}: median {out[name]['median']} spread "
              f"{out[name]['spread']} cold {out[name]['rep0_cold']}", flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_local.json",
    )
    with open(path) as f:
        art = json.load(f)
    art.setdefault("isolated_rebaseline", {}).update(out)
    with open(path, "w") as f:
        f.write(json.dumps(art) + "\n")
    print(f"merged isolated_rebaseline into {path}")


if __name__ == "__main__":
    main()
