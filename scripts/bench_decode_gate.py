"""A/B evidence for decode_image's structural pre-gate (VERDICT r8 #2).

The registered image_decode_stats corpus is 100% well-formed, so the
gate's win never shows in the headline bench: its value is on DIRTY
corpora, where a 2-byte magic + length check routes junk rows past the
full parse attempt AND the raise/except machinery.  This script builds
a mostly-junk corpus — each doc replicated --replicate times via
posexplode(array_repeat(...)) (scan-side, no join), 90% of replicas
swapped to 32 bytes of md5 hex (JVM-side, no Python row UDF) — pins it
in memory so synthesis cost is outside the timed region, then times
decode_image with pregate=True vs pregate=False in the SAME process
(median of --reps, alternating order so JIT/GC drift can't favor one
arm).  The 5000-row first cut measured nothing but job-launch noise
(0.38 vs 0.35 s, spreads 0.11); the per-row delta is ~µs-scale
(raise/except + a failed parse attempt vs a dict probe), so the corpus
must be ~10^6 junk rows for the win to clear noise.  Results merge
into --out under "decode_pregate".

Usage: python scripts/bench_decode_gate.py [--sf-dir /root/testdata/sf0.1]
           [--replicate 200] [--reps 5] [--out BENCH_local.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_repartition_watermark_example_spark import get_spark
from flink_repartition_watermark_example_spark.operators import multimodal as MM
from flink_repartition_watermark_example_spark.sources.tables import load_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=200)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_local.json"))
    args = ap.parse_args()

    spark = get_spark(app_name="bench-decode-gate")
    from pyspark.sql import functions as F

    docs = load_table(spark, args.sf_dir, "documents")
    # replica fan-out on the scan side, then 9/10 replicas become junk
    # (bad magic) — the population the gate exists to short-circuit
    mixed = (
        MM.synth_image_payload(docs)
        .select(
            "doc_id",
            "payload",
            F.posexplode(F.array_repeat(F.lit(1), args.replicate)).alias(
                "r", "_one"
            ),
        )
        .withColumn(
            "payload",
            F.when((F.col("doc_id") + F.col("r")) % 10 == 0, F.col("payload"))
            .otherwise(
                F.encode(
                    F.md5(F.concat_ws("#", "doc_id", "r")), "UTF-8"
                )
            ),
        )
        .select("doc_id", "payload")
    )
    mixed = mixed.persist()
    rows = mixed.count()  # pin: synthesis runs once, outside the timings

    def run(pregate: bool) -> float:
        t0 = time.perf_counter()
        MM.decode_image(mixed, pregate=pregate).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    run(True)  # warm the Arrow/python-worker path once, untimed
    on_runs, off_runs = [], []
    for _ in range(args.reps):
        on_runs.append(run(True))
        off_runs.append(run(False))
    on, off = statistics.median(on_runs), statistics.median(off_runs)

    row = {
        "sf_dir": args.sf_dir,
        "rows": rows,
        "dirty_frac": 0.9,
        "replicate": args.replicate,
        "reps": args.reps,
        "gate_on_sec": round(on, 3),
        "gate_off_sec": round(off, 3),
        "gate_on_spread": round(max(on_runs) - min(on_runs), 3),
        "gate_off_spread": round(max(off_runs) - min(off_runs), 3),
        "speedup": round(off / on, 3),
        "note": "decode_image pre-gate A/B on a 90% junk corpus, same "
        "process, alternating reps; registered queries always run "
        "gate-on (pregate exists only for this measurement).  "
        "MEASURED VERDICT: the gate's wall win is within spread even "
        "at 1M rows — the per-row exception-plumbing delta is sub-µs "
        "(err-string formatting dominates both paths), so the round-7 "
        "0.93->0.69 single-shot claim was box noise; the gate stays "
        "for its error taxonomy (uniform magic/length message vs "
        "whatever the parser happens to raise), not for speed",
    }
    print(json.dumps(row), flush=True)
    if os.path.exists(args.out):
        with open(args.out) as f:
            artifact = json.load(f)
    else:
        artifact = {}
    artifact["decode_pregate"] = row
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)


if __name__ == "__main__":
    main()
