"""Sinks.  The reference prints to stdout (S11, Main.scala:27); the
engine adds the sinks a pipeline actually ships with.

Scale notes baked in:
- Partitioned parquet writes include ``maxRecordsPerFile`` so a skewed
  partition key cannot produce one giant file, and the layout column
  (usually a date) makes downstream partition pruning free.
- Streaming writers default to append mode (the reference's
  exactly-once window emission contract, S10) with a mandatory
  checkpoint location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def print_sink(df: DataFrame, n: int = 20) -> None:
    """Batch analogue of the reference's `.print()` (Main.scala:27)."""
    df.show(n, truncate=False)


def stream_to_console(df: DataFrame, checkpoint: str) -> StreamingQuery:
    """Streaming `.print()` — append mode so each window row appears
    exactly once, when its watermark passes (S10/S11)."""
    return (
        df.writeStream.outputMode("append")
        .format("console")
        .option("truncate", "false")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    w = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w.start()


def batch_upsert_writer(path: str):
    """foreachBatch body giving EXACTLY-ONCE parquet output on top of
    the WAL's at-least-once batch replay.

    The parquet streaming sink's own log already makes plain appends
    exactly-once, but it cannot run arbitrary batch logic (joins,
    repartitioning, merges) per micro-batch — foreachBatch can, at the
    price of at-least-once replay after a crash.  Idempotence is
    restored by making the batch id part of the LAYOUT: each batch
    overwrites its own ``__batch_id=N`` partition (dynamic partition
    overwrite), so a replayed batch replaces its previous, possibly
    partial, output instead of appending duplicates.  Readers scan
    ``path`` recursively and drop the housekeeping column.

    Use with ``df.writeStream.foreachBatch(batch_upsert_writer(p))``.
    """
    from pyspark.sql import functions as F

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(path)
        )

    return write


def stream_to_parquet_idempotent(
    df: DataFrame, path: str, checkpoint: str
) -> StreamingQuery:
    """Append-mode stream through :func:`batch_upsert_writer` — the
    fault-tolerant shape for sinks that need per-batch batch logic."""
    return (
        df.writeStream.outputMode("append")
        .foreachBatch(batch_upsert_writer(path))
        .option("checkpointLocation", checkpoint)
        .start()
    )


def stream_to_memory(df: DataFrame, name: str, checkpoint: str) -> StreamingQuery:
    """Memory sink for tests/inspection (bounded data only)."""
    return (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .start()
    )
