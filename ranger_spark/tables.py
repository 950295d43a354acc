"""Test-table loading helpers over the driver's synthetic parquet data.

Tables (see /root/repo/TESTDATA.md): TPC-H-ish star schema
``region nation customer supplier part orders lineitem`` plus an ``events``
stream table and LLM-pipeline tables ``documents`` / ``embeddings``.

At 100 TB these would be partitioned Iceberg/parquet datasets; reads here go
through ``spark.read.parquet`` so predicate pushdown / column pruning apply
exactly as they would on a partitioned lake layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins at any
# scale (region: 5 rows, nation: 25 rows — fixed-size in TPC-H-style data).
BROADCAST_DIMS = frozenset({"region", "nation"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; the scan prunes columns/filters pushed by
    the caller's plan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects by default; read nanos as long (lossless — the data
        # has microsecond resolution) and convert via events_ts().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with the nanosecond `ts` column converted to a proper
    TimestampType (integer DIV keeps full precision; a double division of an
    ~1.7e18 nanos value would lose sub-second bits)."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    return ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the spark.sql query paths)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
