"""Plan introspection (reference S12: `Main.scala:28` prints the
execution plan before launch).

Spark's `df.explain()` prints to stdout; these helpers return strings /
structured facts so tests and tooling can assert plan properties —
pushdown reached the scan, dims are broadcast, aggregation is
partial+final — instead of eyeballing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what Main.scala:28 printed)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass(frozen=True)
class PlanFacts:
    """Structured properties of the physical plan that matter at scale."""

    n_exchanges: int
    has_broadcast_join: bool
    has_partial_aggregate: bool
    pushed_filters: bool
    read_schema_columns: int | None
    wholestage_codegen: bool


def plan_facts(df: DataFrame) -> PlanFacts:
    s = explain_str(df, "formatted")
    read_cols = None
    for line in s.splitlines():
        if line.strip().startswith("ReadSchema:"):
            read_cols = line.count(",") + 1 if "struct<" in line else None
            break
    return PlanFacts(
        n_exchanges=s.count("Exchange"),
        has_broadcast_join="BroadcastHashJoin" in s or "BroadcastNestedLoopJoin" in s,
        has_partial_aggregate="partial_" in s,
        pushed_filters="PushedFilters: [" in s
        and "PushedFilters: []" not in s,
        read_schema_columns=read_cols,
        wholestage_codegen="WholeStageCodegen" in s.replace("(formatted)", "")
        or "codegen id" in s,
    )
