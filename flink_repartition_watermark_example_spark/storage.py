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
