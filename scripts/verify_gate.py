"""Mirror the driver's verify: entry() smoke at sf0.001, then every
primary QUERIES entry vs its DuckDB oracle at sf0.01 (the driver's SF).

Usage: python scripts/verify_gate.py [names...]  (default: all 50)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from flink_repartition_watermark_example_spark import get_spark  # noqa: E402
from flink_repartition_watermark_example_spark.queries import QUERIES  # noqa: E402
from tests.oracle import assert_matches_oracle  # noqa: E402


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    rows = E.entry(spark).collect()
    print(f"entry smoke: {len(rows)} rows", flush=True)
    names = sys.argv[1:] or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    failed = []
    for i, name in enumerate(names):
        q = QUERIES[name]
        t0 = time.perf_counter()
        try:
            if q.oracle is None:
                n = q.spark(spark, sf_dir).count()
                print(f"[{i+1}/{len(names)}] {name}: rows-only ({n}) "
                      f"{time.perf_counter()-t0:.1f}s", flush=True)
            else:
                assert_matches_oracle(spark, q, sf_dir)
                print(f"[{i+1}/{len(names)}] {name}: OK "
                      f"{time.perf_counter()-t0:.1f}s", flush=True)
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"[{i+1}/{len(names)}] {name}: FAIL {exc}", flush=True)
            traceback.print_exc()
    print(f"DONE: {len(names)-len(failed)}/{len(names)} green; failed={failed}",
          flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
