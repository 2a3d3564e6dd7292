"""Sketch-family queries: bitmap exact-distinct and count-min-sketch
heavy hitters (operators/sketch.py).

Extends the engine's aggregation surface (SURVEY §2.1 S7-S8 — the
reference's fold+combine model, WindowAggregate.scala:22-31) with the
compressed-state aggregates a 100 TB pipeline leans on.  Both queries
are exact integer algebra over the cross-engine md5 hash, so the
DuckDB oracles reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    bitmap_distinct,
    bitmap_distinct_sql,
    cms_build,
    cms_build_sql,
    cms_estimate,
)
from flink_repartition_watermark_example_spark.functions.hashing import md5_long_sql
from flink_repartition_watermark_example_spark.queries import register, register_extra
from flink_repartition_watermark_example_spark.sources.tables import load_table


@register_extra(
    "bitmap_distinct_users",
    bitmap_distinct_sql("events", ["event_type"], "user_id", alias="distinct_users"),
    doc="Exact per-type distinct users via bitmap chunks — shuffle "
    "state is one 8-byte chunk per (type, 32-id range), not one row "
    "per event; same answer as distinct_users_by_type at a fraction "
    "of the shuffle at scale.",
)
def q_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bitmap_distinct(
        load_table(spark, sf_dir, "events"),
        ["event_type"],
        "user_id",
        alias="distinct_users",
    )


def _cms_probe_union(depth: int) -> str:
    h = md5_long_sql("CAST(user_id AS VARCHAR)", salt=f"cms{depth}")
    return f"SELECT user_id, {depth} AS depth, ({h}) % {CMS_WIDTH} AS cell FROM cand"


_CMS_ORACLE = f"""
WITH sketch AS ({cms_build_sql("events", "CAST(user_id AS VARCHAR)")}),
cand AS (SELECT DISTINCT user_id FROM events),
probes AS ({" UNION ALL ".join(_cms_probe_union(d) for d in range(CMS_DEPTH))}),
est AS (
    SELECT p.user_id, min(s.n) AS est
    FROM probes p JOIN sketch s ON p.depth = s.depth AND p.cell = s.cell
    GROUP BY p.user_id
)
SELECT user_id, est FROM est
ORDER BY est DESC, user_id
LIMIT 20
"""


@register_extra(
    "cms_heavy_hitters",
    _CMS_ORACLE,
    doc="Top-20 users by count-min-sketch frequency estimate "
    f"(depth {CMS_DEPTH} × width {CMS_WIDTH}).  The sketch is a "
    "fixed-size aggregate built in one scan with map-side partial "
    "counts; candidates broadcast to the probe join.  Estimates are "
    "deterministic integers (md5 hash family), so the oracle matches "
    "exactly — including CMS's one-sided over-count.",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    sketch = cms_build(ev, key)
    cand = ev.select("user_id").distinct()
    est = cms_estimate(sketch, cand, key)
    return est.orderBy(F.col("est").desc(), "user_id").limit(20)


def _stage_replay_files(df, key_col: str, root: str) -> str:
    """Write the three ``key_col % 3`` arrival files with ONE Spark job
    (a partitioned write + file moves) instead of three filtered scans
    — the staging cost is fixed harness overhead, not the measured
    engine, and was ~1.9 s of each streaming replay at sf0.1 (r12).
    File mtimes are staggered so the file-stream source replays stage
    s as batch s, exactly as the sequential writes did."""
    import os
    import shutil
    import time

    stage = os.path.join(root, "stage")
    src = os.path.join(root, "replay")
    (
        df.withColumn(
            "__stage", F.pmod(F.col(key_col), F.lit(3)).cast("int")
        )
        .repartition("__stage")
        .write.partitionBy("__stage")
        .parquet(stage)
    )
    os.makedirs(src, exist_ok=True)
    now = time.time()
    for s in range(3):
        d = os.path.join(stage, f"__stage={s}")
        files = (
            [fn for fn in sorted(os.listdir(d)) if fn.endswith(".parquet")]
            if os.path.isdir(d)
            else []
        )
        if not files:
            # An empty arrival slice still contributes an (empty) batch
            # file, exactly as the old per-slice writes did — batch s ==
            # stage s must hold UNCONDITIONALLY because the capped
            # cluster-map oracle's emission-horizon SQL renders the cap
            # rule over stage numbers (ADVICE r12 #1: the one-job
            # staging skipped empty slices, shifting batch ids for any
            # corpus with an empty modulo class).  Rare path: one tiny
            # empty-DataFrame write, schema preserved.
            ph = os.path.join(root, f"placeholder_{s}")
            (
                df.sparkSession.createDataFrame([], df.schema)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(ph)
            )
            part = next(
                fn for fn in sorted(os.listdir(ph)) if fn.endswith(".parquet")
            )
            dst = os.path.join(src, f"{s:04d}_0000.parquet")
            shutil.move(os.path.join(ph, part), dst)
            os.utime(dst, (now - 60 + s, now - 60 + s))
            shutil.rmtree(ph, ignore_errors=True)
            continue
        for i, fn in enumerate(files):
            dst = os.path.join(src, f"{s:04d}_{i:04d}.parquet")
            shutil.move(os.path.join(d, fn), dst)
            os.utime(dst, (now - 60 + s, now - 60 + s))
    shutil.rmtree(stage, ignore_errors=True)
    return src


def _replay_through_sketch(spark, df, writer, compact, reader, out_schema,
                           key_col="event_id"):
    """Shared streaming replay harness for the sketch queries: split
    ``df`` into three ``key_col``-keyed arrival files, stream them
    through ``writer`` (foreachBatch, availableNow), ``compact`` the
    versioned store, and pull the bounded sketch snapshot local via
    ``reader`` (the O(1)-index-collect discipline — the returned plan
    must not dangle on the temp dir).  Modulo splits are sparse-id
    safe (range splits are not — the gen_scale stride lesson)."""
    import os
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="stream_sketch_")
    try:
        src = _stage_replay_files(df, key_col, root)

        sketch_dir = os.path.join(root, "sketch")
        # pin the replay to the bounded shuffle width every streaming
        # drain uses (_streaming_confs): the foreachBatch body runs
        # with the SESSION conf, and 32 partitions for a batch-slice
        # shuffle is pure per-batch task overhead.
        from flink_repartition_watermark_example_spark.queries_streaming import (
            _streaming_confs,
        )

        with _streaming_confs(spark):
            q = (
                spark.readStream.schema(df.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.outputMode("append")
                .foreachBatch(writer(sketch_dir))
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        compact(sketch_dir)
        return spark.createDataFrame(
            reader(sketch_dir).collect(), out_schema
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "streaming_cms_heavy_hitters",
    _CMS_ORACLE,
    doc="The incremental count-min sketch (streaming/sketch.py) run "
    "THROUGH Structured Streaming and value-checked against the batch "
    "oracle: events replay as three file-batches, each contributing a "
    "versioned delta sketch via foreachBatch; the versions are then "
    "COMPACTED (lossless counter fold) and the estimate runs over the "
    "compacted snapshot.  Because CMS cells are algebraic counters, "
    "sum-of-deltas == one batch sketch, so the exact same DuckDB "
    "oracle as cms_heavy_hitters applies — streamed-in-any-split, "
    "compacted, and batch all agree bit-for-bit.",
)
def q_streaming_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.streaming.sketch import (
        cms_sketch_writer,
        compact_sketch,
        read_cms_sketch,
    )

    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id", F.col("user_id").cast("string").alias("ukey")
    )
    sketch = _replay_through_sketch(
        spark,
        keyed,
        lambda d: cms_sketch_writer(d, key_col="ukey"),
        lambda d: compact_sketch(spark, d),
        lambda d: read_cms_sketch(spark, d),
        "depth int, cell bigint, n bigint",
    )

    cand = ev.select("user_id").distinct()
    est = cms_estimate(sketch, cand, F.col("user_id").cast("string"))
    return est.orderBy(F.col("est").desc(), "user_id").limit(20)


@register_extra(
    "streaming_hll_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS streamed_equals_direct,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
    doc="Incremental per-key distinct counting over a stream "
    "(streaming/sketch.py HLL index): events replay as three "
    "file-batches, each writing its per-type HLL sketch as a "
    "versioned delta; versions are compacted (register-max union is "
    "lossless and idempotent) and the estimate runs over the "
    "compacted snapshot.  Contract columns checked per row: the "
    "streamed-and-merged estimate EQUALS the one-shot batch estimate "
    "(any split of the input unions to the same registers), and the "
    "5% bound vs exact distinct.  Bounded state: one fixed-size "
    "sketch per key regardless of stream length.",
)
def q_streaming_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.streaming.sketch import (
        compact_hll_sketch,
        hll_sketch_writer,
        read_hll_sketch,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    merged = _replay_through_sketch(
        spark,
        ev,
        lambda d: hll_sketch_writer(d, key_col="user_id", group_col="event_type"),
        lambda d: compact_hll_sketch(spark, d, "event_type"),
        lambda d: read_hll_sketch(spark, d, "event_type"),
        "event_type string, sk binary",
    )

    streamed = merged.select(
        "event_type", F.hll_sketch_estimate("sk").alias("streamed_users")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_users"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
    )
    return streamed.join(direct, "event_type").select(
        "event_type",
        "exact_users",
        (F.col("streamed_users") == F.col("direct_users")).alias(
            "streamed_equals_direct"
        ),
        (
            F.abs(F.col("streamed_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("within_5pct"),
    )


@register_extra(
    "hll_daily_rollup_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS merged_equals_direct,
           TRUE AS merged_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="Two-level mergeable-sketch rollup — the incremental pattern "
    "that makes sketches matter at 100 TB: per-(day, type) HLL "
    "sketches are built in one scan (hll_sketch_agg — what a daily "
    "job would persist as a binary column), then hll_union_agg merges "
    "the stored sketches to per-type totals WITHOUT rescanning raw "
    "events.  Contracts checked per row: (a) the merged estimate "
    "EQUALS the direct single-pass estimate — HLL union at equal "
    "lgConfigK is lossless, register-wise max, so re-aggregation "
    "costs zero accuracy by construction; (b) the 5% error bound vs "
    "exact distinct, as in approx_distinct_users_sketch (~1.6% rsd "
    "at lgConfigK=12).  Sketch internals are engine-specific bits, so "
    "like the other sketch entries the oracle asserts the contract "
    "columns, not the registers.",
)
def q_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_users")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_users"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        "exact_users",
        (F.col("merged_users") == F.col("direct_users")).alias(
            "merged_equals_direct"
        ),
        (
            F.abs(F.col("merged_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("merged_within_5pct"),
    )


@register_extra(
    "aqp_sampled_revenue",
    f"""
    WITH samp AS (
      SELECT l_returnflag,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS s_samp
      FROM lineitem
      WHERE {md5_long_sql('CAST(l_orderkey AS VARCHAR)', salt='aqp')} % 10 = 0
      GROUP BY l_returnflag
    ),
    full_ AS (
      SELECT l_returnflag,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS s_full
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT f.l_returnflag,
           CAST(f.s_full AS DOUBLE) AS exact_revenue,
           CAST(10 * s.s_samp AS DOUBLE) AS est_revenue,
           abs(10 * s.s_samp - f.s_full) * 20 <= f.s_full AS within_5pct
    FROM full_ f JOIN samp s USING (l_returnflag)
    """,
    doc="Approximate query processing by deterministic CLUSTER "
    "sampling: a 10% sample drawn by hash(l_orderkey) — whole orders "
    "in or out, the block-sampling discipline that keeps correlated "
    "rows together and lets the same sample serve any join on the "
    "sampling key — scaled up x10 as the revenue estimate.  At "
    "100 TB this is the only way a dashboard answers in seconds: "
    "the sample is a static 10% of the scan (pushed-down integer "
    "predicate, no shuffle change), and because the hash is the "
    "engine-shared md5 family the SAMPLE ITSELF is value-exact "
    "across engines — the oracle checks the estimate to the bit, "
    "not just the contract.  within_5pct REPORTS whether the "
    "estimate landed inside 5% (computed as ``20*|10*s_samp - "
    "s_full| <= s_full`` in exact decimals — no engine divides); at "
    "sf0.01 one of three flags honestly lands outside, the design "
    "effect of cluster sampling vs row sampling made visible — the "
    "variance lever is the sampling rate, the correctness lever is "
    "nothing (the estimate is unbiased either way).",
)
def q_aqp_sampled_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.functions.hashing import md5_long

    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    samp = (
        li.where(md5_long(F.col("l_orderkey").cast("string"), salt="aqp") % 10 == 0)
        .groupBy("l_returnflag")
        .agg(F.sum(rev).alias("s_samp"))
    )
    full = li.groupBy("l_returnflag").agg(F.sum(rev).alias("s_full"))
    return full.join(samp, "l_returnflag").select(
        "l_returnflag",
        F.col("s_full").cast("double").alias("exact_revenue"),
        (F.lit(10) * F.col("s_samp")).cast("double").alias("est_revenue"),
        (
            F.abs(F.lit(10) * F.col("s_samp") - F.col("s_full")) * F.lit(20)
            <= F.col("s_full")
        ).alias("within_5pct"),
    )
