"""Distributed sketches built from pure column algebra.

The reference has no aggregates beyond a windowed count
(WindowAggregate.scala:22-31); the engine's sketch family extends the
partial+final aggregation model (SURVEY §2.1 S7-S8) to
cardinality/frequency structures that matter at 100 TB:

- **Bitmap exact-distinct** — per-group distinct counting where the
  shuffled state is a fixed-width bitmap chunk per (group, id-range)
  instead of one row per distinct value.  This is the
  ClickHouse/Doris "bitmap" pattern: ``bit_or`` is associative and
  commutative, so Spark computes it map-side-partial + final, and the
  shuffle volume is bounded by (groups × occupied chunks), not by the
  raw row count.
- **Count-min sketch** — frequency estimation in O(depth × width)
  space per group, again via plain ``count``/``min`` aggregates so
  partials combine map-side.  Estimates only ever over-count
  (one-sided error), which the oracle contract checks exactly.

Everything here is deterministic integer arithmetic over the
cross-engine md5 hash (functions/hashing.py), so the DuckDB oracle
reproduces results bit-for-bit — no float, no RNG, no JVM-only hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.functions.hashing import md5_long, md5_long_sql

# 32-bit chunks: shiftleft(1L, bit) with bit < 32 never touches the
# BIGINT sign bit, so Spark and DuckDB agree on every chunk value.
BITMAP_CHUNK_BITS = 32

CMS_DEPTH = 4
CMS_WIDTH = 2048


def bitmap_distinct(
    df: DataFrame, group_cols: list[str], id_col: str, alias: str = "distinct_ids"
) -> DataFrame:
    """Exact COUNT(DISTINCT id) per group via bitmap chunks.

    Two-level aggregation: (group, id div 32) → bit_or of one-hot
    chunk, then per group sum(bit_count(chunk)).  Both levels are
    hash aggregates with map-side partials; the first shuffle carries
    at most one 8-byte chunk per (group, 32-id range) per map task —
    at 100 TB this is the difference between shuffling every event
    and shuffling a compressed id-space summary.  Requires a
    non-negative integral ``id_col``.
    """
    chunk = (F.col(id_col) / BITMAP_CHUNK_BITS).cast("long").alias("_chunk")
    # F.shiftleft only takes a literal shift amount; the per-row bit
    # position needs the SQL form.
    one_hot = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({id_col} % {BITMAP_CHUNK_BITS} AS INT))"
    )
    return (
        df.groupBy(*group_cols, chunk)
        .agg(F.bit_or(one_hot).alias("_bm"))
        .groupBy(*group_cols)
        .agg(F.sum(F.bit_count(F.col("_bm"))).alias(alias))
    )


def bitmap_distinct_sql(
    table: str, group_cols: list[str], id_col: str, alias: str = "distinct_ids"
) -> str:
    """DuckDB twin of :func:`bitmap_distinct` (same chunking, same
    bit_or/bit_count algebra)."""
    groups = ", ".join(group_cols)
    return f"""
    WITH chunks AS (
        SELECT {groups},
               CAST(floor({id_col} / {BITMAP_CHUNK_BITS}) AS BIGINT) AS _chunk,
               bit_or(CAST(1 AS BIGINT) << CAST({id_col} % {BITMAP_CHUNK_BITS} AS INTEGER)) AS _bm
        FROM {table}
        GROUP BY {groups}, _chunk
    )
    SELECT {groups}, CAST(sum(bit_count(_bm)) AS BIGINT) AS {alias}
    FROM chunks
    GROUP BY {groups}
    """


def _cms_cell(key: Column, depth: int) -> Column:
    """Row index ``depth``'s cell for ``key`` — an independent md5
    family member mod the sketch width."""
    return (md5_long(key, salt=f"cms{depth}") % CMS_WIDTH).alias(f"_c{depth}")


def cms_build(df: DataFrame, key: Column) -> DataFrame:
    """Materialize the count-min sketch table (depth, cell, n) for a
    key expression.

    One scan: each row contributes to CMS_DEPTH cells via
    posexplode of a codegen'd 4-element array (no interpreted
    lambda), then a single hash aggregate — partial counts combine
    map-side, so the shuffle carries at most depth×width rows per
    map task regardless of input size.
    """
    cells = F.array(*[_cms_cell(key, d) for d in range(CMS_DEPTH)])
    return (
        df.select(F.posexplode(cells).alias("depth", "cell"))
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key: Column) -> DataFrame:
    """Point-estimate the frequency of each row of ``keys`` from a
    built sketch: min over depth of the key's cell counts.

    ``keys`` is expected to be small (candidate heavy hitters) — it is
    broadcast to the sketch side, so the sketch (the big side at high
    depth×width or many groups) never reshuffles.
    """
    probes = keys.select(
        "*", F.posexplode(F.array(*[_cms_cell(key, d) for d in range(CMS_DEPTH)])).alias(
            "depth", "cell"
        )
    )
    joined = sketch.join(F.broadcast(probes), on=["depth", "cell"], how="inner")
    out_cols = [c for c in keys.columns]
    return joined.groupBy(*out_cols).agg(F.min("n").alias("est"))


def cms_build_sql(table: str, key_expr: str) -> str:
    """DuckDB CTE body producing the identical (depth, cell, n) sketch."""
    rows = " UNION ALL ".join(
        f"SELECT {d} AS depth, ({md5_long_sql(key_expr, salt=f'cms{d}')}) % {CMS_WIDTH} AS cell FROM {table}"
        for d in range(CMS_DEPTH)
    )
    return f"SELECT depth, cell, count(*) AS n FROM ({rows}) GROUP BY depth, cell"
