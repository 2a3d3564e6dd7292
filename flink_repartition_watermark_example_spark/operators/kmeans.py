"""Distributed Lloyd's k-means over the embeddings table, integer-
quantized for exact cross-engine reproducibility — the trained
replacement for `similarity.CENTROID_IDS`' fixed-corpus-row IVF index
(VERDICT round-2 action #5).

Why integers: a float k-means is not hash-comparable across engines
(mean summation order).  Quantizing components to micro-units
(floor(x·1e6) + OFFSET, all positive so floor-div == trunc-div in
every engine) makes each iteration exact: distances are integer sums
of squares (order-independent), new centroids are integer
floor-divided sums.  The DuckDB twin unrolls the same iterations as
CTEs and reproduces every centroid bit-for-bit.

Scale shape (the classic broadcast-model loop, like graph.py):
- centroids live on the driver between iterations (K×dim ints — tiny)
  and ship as literals into the assignment expression; the corpus is
  scanned once per iteration with NO shuffle for assignment;
- the only wide op per iteration is the (cid, dim) partial+final sum
  — Catalyst map-side-combines it, so the shuffle is O(K·dim·
  partitions), independent of corpus size;
- the per-iteration driver round-trip is K·dim integers, the same
  O(1)-per-iteration contract as graph.py's convergence scalars.

Overflow headroom: |q| ≤ ~3.2e6 (micro-units + offset); squared diffs
× 64 dims ≈ 1e15 ≪ 2^63; mean sums ≈ 3e6 × |corpus|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators.similarity import CENTROID_IDS

SCALE = 1_000_000
OFFSET = 2_097_152  # 2^21 > max |quantized component|; keeps values positive
ITERS = 3
DIM = 64

# Production probe width for the TRAINED index: the measured 0.9-recall
# crossing of the nprobe curve for the trained-Lloyd family
# (scripts/record_nprobe_recall.py, BENCH_local.json "nprobe_recall":
# trained crosses at 12 — 0.92 at sf0.01, 0.98 at sf0.1 — where the
# sampled fixed-row index needs 15).  20% less probe work at the same
# recall bar is the payoff of one 3-iteration Lloyd pass; the trained
# family is therefore the documented production default
# (ann_recall_ivf_trained_production), with the sampled pin kept as the
# training-free fallback.
TRAINED_PRODUCTION_NPROBE = 12


def quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, q: array<bigint>) — micro-unit + offset encoding."""
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: (
                F.floor(x.cast("double") * F.lit(float(SCALE))).cast("bigint")
                + F.lit(OFFSET)
            ),
        ).alias("q"),
    )


def _dist_sq(vec_col, cv: list[int]):
    """Integer squared L2 — order-independent, so exact under any
    execution order.  The centroid ships as ONE array literal
    (F.lit(list)), not 64 scalar literals: building a Column is py4j
    round-trips, and the per-element form cost ~2 s of pure driver
    time per 16-centroid expression tree (measured r12)."""
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.lit([int(x) for x in cv]).cast("array<bigint>"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def ranked_centroids(vec_col, cents: list[tuple[int, list[int]]]):
    """array<struct<d, cid>> of ALL centroids sorted by (dist asc,
    centroid_id asc) — the shared ranking expression behind assignment
    (element 1) and probe selection (slice 1..nprobe).

    The whole centroid set ships as ONE nested-array literal plus one
    id-array literal (two py4j calls), and the per-centroid distance
    fold runs inside zip_with — semantically identical to the earlier
    16-struct F.array form (same integer math, same (d, cid)
    lexicographic sort) but ~50x cheaper to CONSTRUCT: plan building
    was 4.9 s of the 9.4 s trained-recall query wall (measured r12)."""
    cv_lit = F.lit([[int(x) for x in cv] for _, cv in cents]).cast(
        "array<array<bigint>>"
    )
    cid_lit = F.lit([int(cid) for cid, _ in cents]).cast("array<bigint>")
    return F.sort_array(
        F.zip_with(
            cv_lit,
            cid_lit,
            lambda cv, cid: F.struct(
                F.aggregate(
                    F.zip_with(vec_col, cv, lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                cid.alias("cid"),
            ),
        )
    )


def assign_col(vec_col, cents: list[tuple[int, list[int]]]):
    """Nearest-centroid id (dist asc, centroid_id asc tiebreak) as a
    scan-side expression over literal centroids — no shuffle."""
    return F.element_at(ranked_centroids(vec_col, cents), 1).getField("cid")


def initial_centroids(emb: DataFrame) -> list[tuple[int, list[int]]]:
    """Deterministic seeding: the same fixed corpus rows the static IVF
    index uses (similarity.CENTROID_IDS), quantized."""
    rows = (
        quantized(emb)
        .where(F.col("vec_id").isin(CENTROID_IDS))
        .select("vec_id", "q")
        .collect()
    )
    return sorted((int(r["vec_id"]), [int(x) for x in r["q"]]) for r in rows)


_TRAIN_MEMO: dict = {}


def _train_key(emb: DataFrame, iters: int):
    """Memo identity for a trained quantizer: session + the source
    files WITH their (size, mtime) fingerprints (the cluster_build /
    storage.py discipline — a regenerated dir must not serve stale
    centroids) + the iteration count."""
    import os

    files = sorted(emb.inputFiles())
    if not files:
        return None  # in-memory relation: no stable identity, no memo
    fps = []
    for f in files:
        p = f[len("file:") :] if f.startswith("file:") else f
        try:
            st = os.stat(p)
            fps.append((f, st.st_size, st.st_mtime_ns))
        except OSError:
            fps.append((f, None, None))
    return (
        emb.sparkSession.sparkContext.applicationId,
        tuple(fps),
        tuple(sorted(emb.columns)),
        int(iters),
    )


def train(emb: DataFrame, iters: int = ITERS) -> list[tuple[int, list[int]]]:
    """Lloyd's iterations; returns the final quantized centroids as
    [(centroid_id, [int]*dim)] keyed by the seed row ids.

    Memoized per (session, source fingerprint, iters): the trained
    centroids are a K x dim integer INDEX ARTIFACT refreshed on the
    index-build cadence, not per query — a recall query probing the
    same index at two widths (ann_recall_ivf_trained_production) or a
    session running several trained-IVF queries pays the Lloyd pass
    once, exactly like cluster_build's shared cluster map."""
    key = _train_key(emb, iters)
    hit = _TRAIN_MEMO.get(key) if key is not None else None
    if hit is not None:
        return hit
    v = quantized(emb)
    cents = initial_centroids(emb)
    for _ in range(iters):
        assigned = v.select(assign_col(F.col("q"), cents).alias("cid"), "q")
        sums = (
            assigned.select("cid", F.posexplode("q").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cid: dict[int, list[int]] = {}
        for r in sums:
            by_cid.setdefault(int(r["cid"]), [0] * DIM)[int(r["pos"])] = int(
                r["s"]
            ) // int(r["n"])
        # a centroid that lost every member keeps its previous position
        prev = dict(cents)
        cents = sorted(
            (cid, by_cid.get(cid, prev[cid])) for cid, _ in cents
        )
    if key is not None:
        _TRAIN_MEMO[key] = cents
    return cents


def centroids_df(emb: DataFrame, iters: int = ITERS) -> DataFrame:
    """Trained centroids exploded to (centroid_id, dim, val_q) — dim is
    1-based, val_q has the offset removed.  Integer rows, exactly
    reproducible by the unrolled-CTE SQL twin."""
    cents = train(emb, iters)
    rows = [
        (cid, d + 1, int(val) - OFFSET)
        for cid, cv in cents
        for d, val in enumerate(cv)
    ]
    return emb.sparkSession.createDataFrame(
        rows, "centroid_id bigint, dim bigint, val_q bigint"
    )


def ivf_trained_topk(
    emb: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    nprobe: int = 2,
    iters: int = ITERS,
) -> DataFrame:
    """IVF search over lists from the TRAINED centroids (vs ivf_topk's
    fixed-row index): corpus assignment is a scan-side literal-centroid
    expression, each query probes its nprobe nearest lists, candidates
    come from a broadcast equi-join on list id, and scoring is integer
    squared L2 in micro-units — every value exact across engines."""
    scored = _trained_scored(emb, num_queries, nprobe, iters)
    return _topk_from_scored(scored, k)


def _trained_scored(
    emb: DataFrame, num_queries: int, nprobe: int, iters: int
) -> DataFrame:
    """(query_id, vec_id, probe_rank, dist_q): every corpus vector in
    one of each query's ``nprobe`` nearest lists, scored by integer
    squared L2, carrying the probed list's rank for that query."""
    cents = train(emb, iters)
    v = quantized(emb)
    rk = ranked_centroids(F.col("q"), cents)
    corpus = v.where(F.col("vec_id") >= num_queries).select(
        "vec_id",
        "q",
        F.element_at(rk, 1).getField("cid").alias("list_id"),
    )
    q = (
        v.where(F.col("vec_id") < num_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("qq"),
            F.posexplode(F.slice(rk, 1, nprobe)).alias("pr0", "probe"),
        )
        .select(
            "query_id",
            "qq",
            (F.col("pr0") + 1).cast("long").alias("probe_rank"),
            F.col("probe.cid").alias("list_id"),
        )
    )
    return corpus.join(F.broadcast(q), "list_id").select(
        "query_id",
        "vec_id",
        "probe_rank",
        F.aggregate(
            F.zip_with(F.col("qq"), F.col("q"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("dist_q"),
    )


def _topk_from_scored(scored: DataFrame, k: int) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_q").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "dist_q", F.col("rank").cast("long").alias("rank")
        )
    )


def ivf_trained_topk_pair(
    emb: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    nprobe_approx: int = TRAINED_PRODUCTION_NPROBE,
    iters: int = ITERS,
) -> tuple[DataFrame, DataFrame]:
    """(approx_topk, exact_topk) for the trained-IVF recall query,
    sharing ONE corpus assignment and ONE scoring pass.

    The exhaustive side probes every list, so its scored relation is a
    superset of the approx side's: a candidate is in the approx set
    iff its list's probe_rank for that query is <= nprobe_approx.
    Scoring once at full width and ranking twice is bit-identical to
    two independent ivf_trained_topk calls (same integer distances,
    same (dist, vec_id) tiebreak) but halves the assignment/scoring
    work — and the scored relation is pinned, because the recall
    join's three branches (approx, exact, exact-distinct) would
    otherwise re-execute it per branch (measured r12: the recall
    query was 9.4 s, ~4.9 s of it duplicated construction+scoring)."""
    n_lists = len(train(emb, iters))
    scored = _trained_scored(emb, num_queries, n_lists, iters).localCheckpoint(
        eager=True
    )
    approx = _topk_from_scored(
        scored.where(F.col("probe_rank") <= nprobe_approx), k
    )
    exact = _topk_from_scored(scored, k)
    return approx, exact
