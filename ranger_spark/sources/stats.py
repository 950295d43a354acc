"""ANALYZE-fed CBO statistics over external parquet tables.

Registers metastore tables pointing at an existing parquet directory
(no data copy) and feeds Catalyst's cost-based optimizer real row
counts + key-column NDVs via ANALYZE TABLE — the engine-side analogue
of the reference keeping DuckDB's table statistics warm. Queries opt in
through the same ``spark.ranger.bucketed.db`` redirection
``tables.load`` already honors (serve the metastore copy when present),
so a stats-fed run needs no query changes.

Caveat (Spark bug, observed on 4.1): CBO's FilterEstimation MatchErrors
on TimestampNTZType column statistics
(``scala.MatchError: TimestampNTZType`` in evaluateBinary via
InjectRuntimeFilter), so timestamp_ntz columns are EXCLUDED from column
stats — table-level row counts still load, and the date filters fall
back to default selectivity instead of crashing the optimizer.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Join/filter key columns worth NDV stats, per table. Narrow on purpose:
# column stats cost one full scan per ANALYZE ... FOR COLUMNS.
_KEY_COLUMNS: dict[str, list[str]] = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "region": ["r_regionkey"],
}


def ensure_stats_db(
    spark: SparkSession,
    data_dir: str,
    db: str,
    tables: tuple[str, ...] = (
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ),
) -> str:
    """Idempotently register ``tables`` from ``data_dir`` as external
    tables in ``db`` with row-count + key-column statistics computed.
    Returns the db name. Skips tables whose stats are already present
    (re-running is cheap: existence check only)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for t in tables:
        if spark.catalog.tableExists(f"{db}.{t}"):
            desc = spark.sql(f"DESCRIBE EXTENDED {db}.{t}").collect()
            if any(
                r["col_name"] == "Statistics" and "rows" in (r["data_type"] or "")
                for r in desc
            ):
                continue  # already analyzed
        else:
            spark.sql(
                f"CREATE TABLE {db}.{t} USING parquet "
                f"LOCATION '{data_dir}/{t}.parquet'"
            )
        spark.sql(f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS")
        ntz = {
            f.name
            for f in spark.table(f"{db}.{t}").schema.fields
            if f.dataType.typeName().startswith("timestamp")
        }
        cols = [c for c in _KEY_COLUMNS.get(t, []) if c not in ntz]
        if cols:
            spark.sql(
                f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS "
                f"FOR COLUMNS {', '.join(cols)}"
            )
    return db


class cbo_session:
    """Context manager: CBO + join reorder on, ``load()`` redirected to
    the stats db; restores every conf on exit."""

    def __init__(self, spark: SparkSession, db: str):
        self.spark = spark
        self.db = db
        self._saved: dict[str, str | None] = {}

    _CONFS = {
        "spark.sql.cbo.enabled": "true",
        "spark.sql.cbo.joinReorder.enabled": "true",
        "spark.sql.cbo.planStats.enabled": "true",
    }

    def __enter__(self):
        for k, v in self._CONFS.items():
            self._saved[k] = self.spark.conf.get(k, None)
            self.spark.conf.set(k, v)
        self._saved["spark.ranger.bucketed.db"] = self.spark.conf.get(
            "spark.ranger.bucketed.db", ""
        )
        self.spark.conf.set("spark.ranger.bucketed.db", self.db)
        return self

    def __exit__(self, *exc):
        for k, v in self._saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)
        return False
