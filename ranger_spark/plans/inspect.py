"""Physical-plan inspection helpers.

The reference delegates all optimization to DuckDB and exposes EXPLAIN
verbatim (reference server/query/engine.go:616-633); here the optimizer is
Catalyst, and these helpers make its decisions *testable*: scan pushdown,
column pruning, join strategy, and whole-stage codegen are asserted in
tests/test_plans.py so a regression that silently de-optimizes a plan
(e.g. a filter that stops reaching the parquet scan) fails CI instead of
shipping a 100× slowdown at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All parquet-scan PushedFilters entries across the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for every scan (column-pruning check)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))


def _count_op(df: DataFrame, name: str) -> int:
    # the formatted plan prints each operator twice (tree + numbered
    # detail); count only the numbered detail headers
    return len(re.findall(rf"\n\(\d+\) {name}\b", formatted_plan(df)))


def join_strategies(df: DataFrame) -> dict[str, int]:
    """Counts of each physical join operator in the plan."""
    return {
        name: _count_op(df, name)
        for name in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        )
    }


def num_exchanges(df: DataFrame) -> int:
    """Shuffle count (Exchange operators; BroadcastExchange not counted)."""
    return _count_op(df, "Exchange")


def has_codegen(df: DataFrame) -> bool:
    """True if any WholeStageCodegen span exists in the executed plan."""
    return "WholeStageCodegen" in df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "codegen"
    )
