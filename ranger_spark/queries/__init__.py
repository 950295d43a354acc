"""Query registry: every operator in SURVEY.md §2 (plus the LLM-pipeline
extensions) is registered here as a (DataFrame builder, ANSI-SQL oracle)
pair. ``__spark_entry__.py`` exposes this registry to the driver.

Builders take ``(spark, sf_dir)`` and return a DataFrame; oracles are
DuckDB-runnable SQL over the same parquet tables. Column names are aliased
identically on both sides (the driver sorts columns by name before hashing).
Double-typed aggregates are rounded on both sides so the order-insensitive
value hash is stable across engines.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for the DuckDB oracle; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query builder with its oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


_MODULES = (
    "ranger_spark.queries.core_sql",
    "ranger_spark.queries.analytics",
    "ranger_spark.queries.pipeline",
    "ranger_spark.queries.tpch_like",
    "ranger_spark.queries.streaming_q",
)


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry."""
    for m in _MODULES:
        importlib.import_module(m)
    return REGISTRY
