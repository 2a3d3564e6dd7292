"""Bucketed-table storage for co-located joins.

At 100 TB the shuffle in a fact⋈fact join dominates; writing both
sides bucketed by the join key (`bucketBy` + `sortBy`) lets Spark join
them with ZERO exchange — each bucket pair joins locally.  This is the
persistent-layout complement to broadcast (small dims) and AQE (runtime
fixes): pay the shuffle once at write time, never at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same keys/bucket-count — the
    plan must contain no Exchange (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_mb: int = 512,
) -> int:
    """Compact a directory of (typically many small) parquet files into
    ~``target_file_mb``-sized files at ``dst_dir``; returns the output
    file count.

    The small-files problem is the dominant metadata tax of streaming
    and per-batch ingests: a million 1 MB files cost a NameNode/listing
    scan per query and one task per file.  Compaction here is
    partition-count arithmetic, not config guesswork: output files =
    ceil(input_bytes / target), laid down by a round-robin
    ``repartition(n)`` so files are uniformly sized regardless of key
    skew.  Runs as one distributed job; no driver-side data movement.

    Write lands in ``dst_dir`` (not in place): an atomic swap of the
    directory pointer is the caller's move — in-place compaction that
    deletes inputs on success is not crash-safe without a table format
    (Delta/Iceberg rewrite-files), which is out of scope here.
    """
    import math

    from pyspark.sql import functions as F

    files = spark.read.parquet(src_dir)
    # Distributed byte count via the file metadata column — no listing
    # loop on the driver, no full data scan (metadata-only projection).
    total_bytes = (
        files.select(F.col("_metadata.file_size").alias("sz"), F.col("_metadata.file_path").alias("fp"))
        .groupBy("fp")
        .agg(F.first("sz").alias("sz"))
        .agg(F.sum("sz").alias("b"))
        .collect()[0]["b"]
    ) or 0
    n = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    files.repartition(n).write.mode("overwrite").parquet(dst_dir)
    return n
