"""Scale helpers shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, *cols: str) -> DataFrame:
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
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)
