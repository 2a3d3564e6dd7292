"""Change-data-capture apply: MERGE semantics as relational algebra.

The reference family's streaming engines express this as dynamic-table
upsert; warehouses as ``MERGE INTO``.  Without a transactional table
format (Delta/Iceberg), the apply is still exactly expressible as a
batch plan over (base, changes): keep base rows whose key has no
change, and materialize the LATEST change per key unless it is a
delete.

Scale shape: the only wide operations are one hash shuffle of the
changeset (for latest-per-key) and one anti-join of base against the
changed KEYS — the changeset in CDC is orders of magnitude smaller
than the base, so the anti-join broadcasts its build side and the
base table streams through map-side.  The base is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OP_COL_VALUES = ("I", "U", "D")


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changeset to a base snapshot.

    ``changes`` carries the base's payload columns plus ``op_col``
    (one of I/U/D) and ``seq_col`` (monotone per key; highest wins —
    the standard "latest change by log sequence number" contract).
    Ties on ``seq_col`` break deterministically by op descending
    (U > I > D) so replayed logs resolve identically everywhere.
    Returns the post-apply snapshot with the base's columns.
    """
    payload = [c for c in base.columns]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = base.join(
        F.broadcast(latest.select(*key_cols).distinct()), key_cols, "left_anti"
    )
    upserts = latest.where(F.col(op_col) != "D").select(*payload)
    return untouched.unionByName(upserts)
