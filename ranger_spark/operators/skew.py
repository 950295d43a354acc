"""Skew-mitigation helpers for hot-key joins and aggregations.

AQE's skew-join splitting (on in our session factory) handles most skew at
runtime by splitting oversized shuffle blocks; these explicit helpers cover
the cases AQE can't: a *broadcast-ineligible* hot-key join where one key is
so dominant that even split blocks serialize on the build side, and
high-cardinality-input aggregations where a two-phase partial combine on a
salted key relieves a hot reducer.

- ``salted_join(left, right, key, salt)``: left rows get a random salt in
  [0, salt); right rows replicate to all salt values. The shuffle key
  becomes (key, salt) so one hot key spreads over `salt` reducers. Use
  when the right side is small-ish per key but the left is hot-keyed;
  replication multiplies the right side by `salt`.
- ``salted_agg(df, keys, aggs, salt)``: two-phase aggregation — partial
  agg on (keys, salt), final agg on keys. Only needed for aggregates
  without map-side combine shrinkage (e.g. collect_list); sums/counts
  already combine map-side.

Salting uses a *deterministic* hash-based salt (pmod of a row hash) rather
than rand() so retried tasks produce identical output (rand() in a shuffle
input breaks task-retry determinism and any oracle comparison).

Content-hash salting degrades on the one skew case it most targets:
byte-identical duplicate rows all hash to the same salt and still land on
one reducer. ``positional=True`` switches to a row-position salt
(``monotonically_increasing_id`` = partition id + in-partition offset), which
spreads duplicates uniformly; it stays deterministic as long as the input
partitioning is (a file scan is; rows freshly out of a shuffle may reorder
on a task retry — salt before shuffling, as these helpers do).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int, positional: bool = False) -> Column:
    if positional:
        # row-position salt: spreads byte-identical duplicates too
        return F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    # deterministic per-row salt: hash all columns; stable across retries
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    positional: bool = False,
) -> DataFrame:
    """Equi-join on `key` with the hot left side salted and the right side
    replicated `salt`×. Pass ``positional=True`` when the hot key's rows may
    be byte-identical (content-hash salting can't spread those)."""
    l_salted = left.withColumn("__salt", _salt_col(left, salt, positional))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l_salted.join(r_replicated, [key, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: "dict[str, str] | list[tuple[str, str]]",
    salt: int = 8,
    positional: bool = False,
) -> DataFrame:
    """Two-phase aggregation: (keys, salt) partial → keys final.
    `aggs` maps column → 'sum' | 'count' | 'min' | 'max' (mergeable
    aggs), or a list of (column, fn) pairs when one column needs several
    aggregates; output columns are named `{fn}_{col}`. One salted
    shuffle carries ALL the partials."""
    pairs = list(aggs.items()) if isinstance(aggs, dict) else list(aggs)
    partial_exprs = []
    final_exprs = []
    for col, fn in pairs:
        name = f"{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(name))
            final_exprs.append(F.sum(name).alias(name))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(name))
            final_exprs.append(getattr(F, fn)(name).alias(name))
        else:
            raise ValueError(f"non-mergeable aggregate {fn!r}")
    salted = df.withColumn("__salt", _salt_col(df, salt, positional))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
