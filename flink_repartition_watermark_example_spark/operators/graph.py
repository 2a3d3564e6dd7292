"""Distributed iterative graph operators.

The one graph computation a curation pipeline genuinely needs is
connected components over the near-duplicate pair graph: LSH + jaccard
verification emits PAIRS, but the deliverable is CLUSTERS — the
transitive closure (a≈b, b≈c ⇒ {a,b,c} share one representative even
when a and c were never proposed as a pair).

This is inherently iterative, so it is the one operator family where a
driver-side loop over DataFrame actions is the *correct* Spark shape
(the loop runs O(component-diameter) rounds; each round is fully
distributed).  The reference engine has no graph surface; this extends
the dedup family (operators/dedup.py) to its standard end point
(cf. the alternating-star formulation of Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — the label-propagation
below is the simple variant; near-dup components are shallow, so
rounds ≈ 2-3 in practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "v",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, component) with component = min vertex id reachable.

    Min-label propagation to a fixpoint:

      label(v) ← min(label(v), min_{(u,v)∈E} label(u))

    Each round is one shuffle join (labels through edges) plus one
    partial+final hash aggregation — no per-row driver work, no
    collect of vertex data.  Convergence is detected by the global
    sum of labels (a single scalar action): labels only ever
    decrease, so an unchanged sum IS the fixpoint — cheaper than a
    change-counting self-join.

    Lineage is truncated every round with ``localCheckpoint`` —
    without it the plan doubles per iteration and Catalyst analysis
    goes exponential.  On a real cluster with executor loss concerns,
    swap in reliable ``checkpoint()`` against the cluster checkpoint
    dir; semantics are identical.

    ``vertices`` must contain every vertex (isolated ones become
    singleton components); edges are treated as undirected and may
    contain duplicates or self-loops (both are harmless: union +
    min-agg dedups).
    """
    sym = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).union(edges.select(F.col(dst_col).alias("__s"), F.col(src_col).alias("__d")))

    labels = vertices.select(
        F.col(vertex_col).alias("__v"), F.col(vertex_col).alias("__lbl")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("__lbl")).collect()[0][0]

    for _ in range(max_iter):
        msgs = sym.join(labels, sym["__s"] == labels["__v"]).select(
            F.col("__d").alias("__v"), F.col("__lbl")
        )
        labels = (
            labels.union(msgs)
            .groupBy("__v")
            .agg(F.min("__lbl").alias("__lbl"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("__lbl")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return labels.select(
        F.col("__v").alias(vertex_col), F.col("__lbl").alias("component")
    )


# PageRank fixed-point geometry: ranks are integer micro-units
# (SCALE = 1e9) and the damping factor is the rational 17/20 (= 0.85),
# so every update is integer multiply / integer divide — exactly
# reproducible across engines and partition orders, unlike float
# PageRank whose sums depend on reduction order.
PAGERANK_SCALE = 1_000_000_000
PAGERANK_D_NUM = 17
PAGERANK_D_DEN = 20


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    vertex_col: str = "v",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    n_iter: int = 10,
) -> DataFrame:
    """Weighted PageRank, fixed-point: (vertex, rank_q) after exactly
    ``n_iter`` synchronous iterations, rank_q in 1e-9 units.

      r'(v) = BASE + (17 · Σ_{u→v} (r(u)·w_uv) DIV wout(u)) DIV 20
      BASE  = (3 · SCALE) DIV (20 · N)          (teleport term, 1−d = 3/20)
      r0    = SCALE DIV N

    Each iteration is one broadcast-size join of ranks onto the edge
    list plus a hash aggregation of integer contributions — the
    canonical distributed shape; at web scale the rank table shuffles
    by dst instead of broadcasting, same plan.  Dangling mass is not
    redistributed (both engines implement the identical simplification,
    so the oracle comparison is exact).  Lineage is truncated per
    iteration as in :func:`connected_components`.
    """
    n = nodes.count()
    base = (3 * PAGERANK_SCALE) // (PAGERANK_D_DEN * n)

    wout = edges.groupBy(src_col).agg(F.sum(weight_col).alias("__wout"))
    e = edges.join(wout, src_col).select(
        F.col(src_col).alias("__s"),
        F.col(dst_col).alias("__d"),
        F.col(weight_col).alias("__w"),
        "__wout",
    ).localCheckpoint(eager=True)

    ranks = nodes.select(
        F.col(vertex_col).alias("__v"),
        F.lit(PAGERANK_SCALE // n).cast("long").alias("__r"),
    ).localCheckpoint(eager=True)

    for _ in range(n_iter):
        contribs = (
            e.join(ranks, e["__s"] == ranks["__v"])
            .select(
                F.col("__d"),
                F.expr("(__r * __w) DIV __wout").alias("__c"),
            )
            .groupBy("__d")
            .agg(F.sum("__c").alias("__cs"))
        )
        ranks = (
            ranks.select("__v")
            .join(contribs, ranks["__v"] == contribs["__d"], "left")
            .select(
                "__v",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PAGERANK_D_NUM} * coalesce(__cs, 0L)) DIV {PAGERANK_D_DEN}"
                    )
                ).cast("long").alias("__r"),
            )
            .localCheckpoint(eager=True)
        )

    return ranks.select(
        F.col("__v").alias(vertex_col), F.col("__r").alias("rank_q")
    )
