"""Bucketed tables: co-located joins and aggregations without shuffles.

At 100 TB the dominant cost of fact-to-fact joins (lineitem ⋈ orders) is
the shuffle of both sides. Writing both tables bucketed by the join key
pre-partitions the data on disk; Spark's scan then reports the bucket
distribution and Catalyst elides the Exchange on both sides — the join
runs shuffle-free regardless of data size. (The reference's Iceberg layer
always writes an empty partition spec — SURVEY §1.3 — so it never gets
this; Iceberg's bucket partition transform is the connector-native
equivalent of what this module does with Spark bucketing.)

Verified in tests/test_bucketing.py: the bucketed join plan contains zero
shuffle Exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write df as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key: with
    spark.sql.sources.bucketing.enabled (default true) and matching bucket
    counts this plans with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
