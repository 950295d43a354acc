"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator registry of
``ranger_spark.queries`` (SURVEY.md §2 inventory + LLM-pipeline
extensions), each paired with a DuckDB-runnable ANSI-SQL oracle where the
semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ranger_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing-summary aggregation pipeline) on sf0.001."""
    registry = load_all()
    return registry["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracles (DuckDB) for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
