"""Scale helpers shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, *cols: str, parts: int | None = None) -> DataFrame:
    """Raise upstream parallelism to the session default before a
    CPU-heavy per-row stage.

    A narrow pipeline inherits the scan's split count; when that is
    below the core count (single-row-group files locally, a few huge
    blobs on a cluster) every downstream expression runs underparallel.
    One explicit hash repartition of the *pre-feature* rows (cheap to
    shuffle — the expensive columns are computed after) buys full-width
    execution.  With ``cols`` the distribution is hash(cols) —
    deterministic and skew-free for unique keys; without, round-robin.

    Do NOT use after wide transforms: those already run at
    ``spark.sql.shuffle.partitions`` and AQE coalesces them.

    ``parts`` overrides the partition count.  Raising it above the
    core count shrinks each task's working set without adding
    concurrency — the lever for downstream stages whose per-partition
    memory grows with data (window sorts over exploded rows): hash
    partitioning on the same cols still satisfies their distribution,
    so no extra exchange appears.
    """
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)


def stage_width(df: DataFrame) -> int:
    """Partition count for fan_out ahead of memory-heavy exploded
    stages (window sorts, pair joins): the session's
    ``spark.sql.shuffle.partitions``, floored at the core count.

    Downstream stages inherit the fan_out partitioning (hash on the
    same keys satisfies their distribution — no extra exchange), so
    this makes shuffle.partitions the ONE lever that sizes their
    per-task working set: the bench at sf0.1 keeps the core count (a
    fixed 4x width cost ngram_jaccard 2.2x in per-task overhead at
    5k docs), while scale sweeps raise the conf to 4x cores and the
    same stages run with a quarter of the task memory.
    """
    spark = df.sparkSession
    return max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salt_buckets: int = 16,
):
    """Two-stage aggregation for skewed keys.

    A hot key (one url with 30% of 100 TB of traffic) turns a hash agg
    into a single straggler task.  Salting splits each key into
    ``salt_buckets`` sub-groups for the first (partial) aggregation,
    then re-aggregates the partials — both stages are ordinary hash
    aggs, and the hot key's work spreads across ``salt_buckets`` tasks.

    ``aggs`` maps output column → (op, input column) with op in
    {"count", "sum", "min", "max"} — the algebraic ops that re-combine
    losslessly (count recombines by sum).  AQE's skew handling covers
    joins; this covers aggregations, which AQE does not rebalance.
    """
    from pyspark.sql import functions as F

    recombine = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    first = {"count": lambda c: F.count(F.lit(1)), "sum": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[first[op](col).alias(out) for out, (op, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[recombine[op](out).alias(out) for out, (op, _) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    spread_col: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the non-broadcastable ``dim`` side is
    replicated ``salt_buckets`` times and ``fact`` rows are salted
    deterministically, so one hot join key spreads across
    ``salt_buckets`` tasks instead of one straggler partition.

    AQE's skew-join splitting only kicks in for sort-merge joins with
    detectably oversized partitions AFTER a shuffle materializes them;
    pre-salting is the plan-level guarantee (and the only option when
    the skew is known up front — e.g. a join keyed by event_type where
    one type is 90% of 100 TB of traffic).

    ``spread_col``: a high-cardinality fact column (a unique id) whose
    hash distributes the hot key's rows uniformly over the salt —
    deterministic (pmod of the column hash), so results are exactly
    reproducible, unlike a rand() salt.  Cost: dim shuffles
    ``salt_buckets``× its size — use only when dim is too big to
    broadcast AND the fact key is skewed.
    """
    from pyspark.sql import functions as F

    rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    salted = fact.withColumn(
        "__salt", F.pmod(F.hash(F.col(spread_col)), F.lit(salt_buckets))
    )
    return salted.join(rep, [key, "__salt"], how).drop("__salt")
