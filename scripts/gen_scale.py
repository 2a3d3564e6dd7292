"""Generate scaled-up derivatives of the driver testdata for scale
validation (VERDICT round-2 action #1: prove the 100×-scale claims).

The driver's parquet tops out at sf0.1; every "100 TB-safe" claim in
the tree rests on evidence there.  This script derives sfN from sf0.1
by deterministic replication — each replica shifts every key domain by
a fixed stride (FK integrity preserved: o_custkey shifts exactly like
c_custkey), perturbs document text (every token suffixed per replica →
shingle sets disjoint across replicas, so the dedup family scales like
a mostly-unique corpus — true pair count linear in mult, never
C(mult, 2)) and embedding components (per-dim deterministic offsets
so ANN candidates don't tie across replicas).

Replication runs AS a Spark job (explode over a replica sequence — one
scan, no driver loop), so generating sf1 is itself a test of the
engine's write path.  Output goes under .scaledata/ (gitignored);
dims (region, nation) are copied unscaled, like TPC-H.

Usage: python scripts/gen_scale.py [--mult 10] [--src /root/testdata/sf0.1]
       [--out .scaledata/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark import get_spark
from flink_repartition_watermark_example_spark.datamodel import TABLES

# Key-domain strides: every column in one domain shifts identically so
# joins keep matching across replicas.  Strides far exceed sf0.1 max
# keys; int64 headroom is ample (mult ≤ 1e6).
STRIDE = {
    "custkey": 10**6,
    "orderkey": 10**7,
    "partkey": 10**6,
    "suppkey": 10**5,
    "user": 10**6,
    "event": 10**8,
    "doc": 10**6,
    "vec": 10**6,
}

KEY_SHIFTS: dict[str, list[tuple[str, int]]] = {
    "customer": [("c_custkey", STRIDE["custkey"])],
    "supplier": [("s_suppkey", STRIDE["suppkey"])],
    "part": [("p_partkey", STRIDE["partkey"])],
    "orders": [
        ("o_orderkey", STRIDE["orderkey"]),
        ("o_custkey", STRIDE["custkey"]),
    ],
    "lineitem": [
        ("l_orderkey", STRIDE["orderkey"]),
        ("l_partkey", STRIDE["partkey"]),
        ("l_suppkey", STRIDE["suppkey"]),
    ],
    "events": [
        ("event_id", STRIDE["event"]),
        ("user_id", STRIDE["user"]),
    ],
    "documents": [("doc_id", STRIDE["doc"])],
    "embeddings": [("vec_id", STRIDE["vec"])],
}

DIMS = ("region", "nation")


def scale_table(spark, src_dir: str, out_dir: str, name: str, mult: int) -> int:
    src = os.path.join(src_dir, f"{name}.parquet")
    out = os.path.join(out_dir, f"{name}.parquet")
    df = spark.read.parquet(src)
    if name in DIMS or mult == 1:
        df.write.mode("overwrite").parquet(out)
        return df.count()

    # widen BEFORE the explode: the sf0.1 source is typically one
    # parquet split, so the ×mult row fan-out (and everything after)
    # would otherwise run in a single task — at mult=1000 that is a
    # 600M-row single-threaded stage
    df = df.repartition(spark.sparkContext.defaultParallelism)
    rep = df.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
    )
    for col, stride in KEY_SHIFTS.get(name, []):
        rep = rep.withColumn(
            col, (F.col(col) + F.col("__r").cast("long") * F.lit(stride)).cast("long")
        )
    if name == "customer":
        # keep names consistent with shifted keys — duplicated names
        # across replicas would inflate fuzzy-linkage blocks 10×
        rep = rep.withColumn(
            "c_name",
            F.concat(
                F.lit("Customer#"), F.lpad(F.col("c_custkey").cast("string"), 9, "0")
            ),
        )
    if name == "supplier":
        rep = rep.withColumn(
            "s_name",
            F.concat(
                F.lit("Supplier#"), F.lpad(F.col("s_suppkey").cast("string"), 9, "0")
            ),
        )
    if name == "documents":
        # EVERY token gets a per-replica suffix (r>0), so shingle sets
        # are fully disjoint across replicas and the dedup family
        # scales like a mostly-unique corpus: true near-dup pairs grow
        # linearly with mult (the sf0.1 near-dup structure repeats once
        # per replica).  The earlier form appended ONE trailing token,
        # which left replicas of the same doc at ~0.96 shingle-jaccard
        # of each other — every doc acquired mult-1 near-identical
        # twins, true pair count grew as C(mult, 2), and the sf10
        # sweep measured that quadratic OUTPUT as if it were engine
        # super-linearity (worst entry 9.8× on 10× data).
        rep = rep.withColumn(
            "text",
            F.when(F.col("__r") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(
                            t, F.lit("~r"), F.col("__r").cast("string")
                        ),
                    ),
                    " ",
                )
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if name == "embeddings":
        # deterministic per-replica, per-dim jitter so replicas aren't
        # cosine-identical (ANN ranking would tie otherwise)
        rep = rep.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + (
                        ((F.col("__r") * 37 + i) % 11 - 5).cast("float")
                        * F.lit(0.002)
                    )
                    * F.when(F.col("__r") == 0, F.lit(0.0)).otherwise(F.lit(1.0))
                ).cast("float"),
            ),
        )
    n = rep.count()
    out_df = rep.drop("__r")
    if name != "events":
        # Realistic storage layout: a table at this scale is never one
        # or two parquet files — the source explode writes as many
        # parts as the (tiny) input had splits, which leaves the scan
        # (+ partial agg) stage of every downstream query running on
        # 1-2 tasks and measures layout, not engine (pricing_summary
        # read 5.8× at sf1 purely from the serial scan).  Target
        # ~500k rows/part, floor 4, cap 256.
        out_df = out_df.repartition(max(4, min(256, n // 500_000)))
    else:
        # The streaming replay harness turns each input file into a
        # micro-batch (maxFilesPerTrigger=1, close sentinels last), so
        # part files must be EVENT-TIME ORDERED across parts: with a
        # 0-second watermark delay, a part holding earlier events than
        # an already-replayed part would have its rows silently dropped
        # as late.  repartitionByRange(ts) makes part-i hold a
        # contiguous ts range below part-(i+1) (plain coalesce gave no
        # such guarantee); few parts keep per-batch state-store commit
        # overhead bounded.  scale_check.py additionally asserts
        # stream==batch row counts so a regression here is loud.
        out_df = out_df.repartitionByRange(max(1, mult // 4), "ts")
    out_df.write.mode("overwrite").parquet(out)
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaledata",
            "sf1",
        ),
    )
    ap.add_argument(
        "--tables",
        default=",".join(TABLES),
        help="comma-separated subset of tables to generate (default "
        "all) — a sweep touching only `documents` doesn't need the "
        "11 GB-at-mult-1000 lineitem fan-out or its disk",
    )
    args = ap.parse_args()

    wanted = [t for t in args.tables.split(",") if t]
    unknown = set(wanted) - set(TABLES)
    if unknown:
        raise SystemExit(f"unknown tables: {sorted(unknown)}")

    spark = get_spark(app_name="gen-scale")
    os.makedirs(args.out, exist_ok=True)
    for name in wanted:
        n = scale_table(spark, args.src, args.out, name, args.mult)
        print(f"{name}: {n} rows -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
