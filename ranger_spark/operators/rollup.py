"""Incremental time-bucket rollups (hypertable-style continuous
aggregates): maintain a materialized per-bucket aggregate table that is
refreshed by processing only rows newer than the destination's high-water
mark.

Without an Iceberg/Delta snapshot log in this environment the high-water
mark is the max bucket already materialized; refresh recomputes the last
(possibly partial) bucket plus anything newer and overwrites just those
buckets — the standard continuous-aggregate contract (closed buckets are
immutable, the open bucket is replaced each refresh). On Iceberg this
becomes `REPLACE WHERE bucket >= hwm` / a MERGE on the snapshot delta.

Scale: each refresh reads only `ts >= hwm_bucket` (partition-prunable when
the source is bucket-partitioned) and shuffles O(new buckets × keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def bucketize(ts_sec: Column, bucket_seconds: int) -> Column:
    return (ts_sec / bucket_seconds).cast("long") * bucket_seconds


def compute_rollup(
    source: DataFrame,
    ts_sec_col: str,
    keys: list[str],
    value_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Full rollup: (bucket, keys) → count/sum/min/max of value."""
    return (
        source.withColumn(
            "bucket", bucketize(F.col(ts_sec_col), bucket_seconds)
        )
        .groupBy("bucket", *keys)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )


def refresh_rollup(
    spark: SparkSession,
    source: DataFrame,
    dest_table: str,
    ts_sec_col: str,
    keys: list[str],
    value_col: str,
    bucket_seconds: int,
) -> int:
    """Create or incrementally refresh `dest_table`. Returns the number of
    buckets (re)materialized this refresh."""
    if not spark.catalog.tableExists(dest_table):
        full = compute_rollup(source, ts_sec_col, keys, value_col, bucket_seconds)
        full.write.saveAsTable(dest_table)
        return full.select("bucket").distinct().count()

    hwm = spark.table(dest_table).agg(F.max("bucket")).collect()[0][0]
    fresh = compute_rollup(
        source.filter(F.col(ts_sec_col) >= F.lit(hwm)),
        ts_sec_col,
        keys,
        value_col,
        bucket_seconds,
    )
    n = fresh.select("bucket").distinct().count()
    if n == 0:
        return 0
    # replace the open bucket + append newer ones: keep closed buckets,
    # union the recomputed tail (staging write: Spark cannot overwrite a
    # table it is reading; Iceberg turns this into one REPLACE WHERE commit)
    kept = spark.table(dest_table).filter(F.col("bucket") < F.lit(hwm))
    merged = kept.unionByName(fresh)
    staging = dest_table + "__rollup_staging"
    merged.write.mode("overwrite").saveAsTable(staging)
    spark.table(staging).write.mode("overwrite").insertInto(dest_table, overwrite=True)
    spark.sql(f"DROP TABLE {staging}")
    return n
