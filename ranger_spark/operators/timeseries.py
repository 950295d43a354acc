"""Time-series join operators Spark lacks as builtins: as-of join and
range join, implemented with scale-safe plans (no inequality-join
explosion, no per-row Python).

- **As-of join** (latest right-side row at or before each left row):
  union-then-window. Both sides are tagged and unioned, sorted within the
  partition key by (ts, side-order), and ``last(right_value, ignorenulls)``
  over the preceding frame fills each left row with the most recent right
  row. One shuffle on the key — same cost as a groupBy, regardless of how
  many right rows precede each left row. A naive inequality join would be
  O(|L|·|R|) per key.

- **Range join** (pairs within a time distance): bucketize timestamps to
  the range width; each left row joins only its own and the adjacent
  bucket (explode of 2 bucket ids), then the exact predicate filters.
  Equi-join on (key, bucket) keeps the shuffle hash-partitioned and the
  candidate set linear in data size for bounded density.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (per `on` key). Timestamps are numeric (epoch or
    integer nanos). `tolerance` (same unit) drops matches older than
    left_ts - tolerance."""
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        "*",
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in [right_ts, *right_cols]]).alias("__rv"),
    )
    unioned = l_tagged.unionByName(
        r_tagged, allowMissingColumns=True
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__match", F.last("__rv", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    if tolerance is not None:
        filled = filled.withColumn(
            "__match",
            F.when(
                F.col("__ts") - F.col(f"__match.{right_ts}") <= tolerance,
                F.col("__match"),
            ),
        )
    out_cols = [c for c in left.columns]
    return filled.select(
        *out_cols,
        *[
            F.col(f"__match.{c}").alias(f"asof_{c}")
            for c in [right_ts, *right_cols]
        ],
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_distance: int,
    condition: Column | None = None,
) -> DataFrame:
    """All (left, right) pairs with |left_ts - right_ts| <= max_distance
    (plus an optional extra predicate), via bucketized equi-join: left
    explodes into its bucket and the next one; right keeps one bucket; the
    exact distance predicate filters after the hash join."""
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.array(
                (F.col(left_ts) / max_distance).cast("long") - 1,
                (F.col(left_ts) / max_distance).cast("long"),
                (F.col(left_ts) / max_distance).cast("long") + 1,
            )
        ),
    )
    rb = right.withColumn("__bucket", (F.col(right_ts) / max_distance).cast("long"))
    joined = lb.join(rb, [on, "__bucket"]).filter(
        F.abs(F.col(left_ts) - F.col(right_ts)) <= max_distance
    )
    if condition is not None:
        joined = joined.filter(condition)
    return joined.drop("__bucket")
