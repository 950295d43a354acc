"""Z-order (Morton-curve) write layout for multi-dimensional data
skipping — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` analog.

A table sorted on one key prunes row groups only for predicates on that
key; interleaving the bits of several normalized columns into one
Morton value and range-partitioning + sorting on it gives every file a
tight min/max envelope on EVERY participating column, so parquet
footer pruning works for predicates on any of them. This is a pure
layout job (one stats aggregate + one range shuffle + a write): the
reads that benefit need no code change — Spark's scan already prunes on
footer min/max.

All expressions are JVM Column arithmetic (shift/mask interleave
unrolled per bit) — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-column resolution; 2 cols x 16 bits fits a long


def _normalize(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale a numeric column linearly onto [0, 2^bits) as a long."""
    span = (cmax - cmin).cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin) / span).otherwise(0.0)
    top = (1 << bits) - 1
    return F.least(
        F.lit(top).cast("long"), F.floor(frac * top).cast("long")
    )


def zorder_value(cols: list[Column], mins, maxs, bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave the normalized bit patterns of ``cols``
    (column i contributes bit b to output position b*len(cols)+i)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    parts = []
    for i, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        v = _normalize(c, lo, hi, bits)
        for b in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftrightunsigned(v, b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Rewrite ``df`` under ``path`` clustered along the Morton curve of
    ``zorder_cols``: one min/max aggregate (driver-side scalars — the
    layout parameters), then range-partition + sort on the z-value so
    each output file covers a compact hyper-rectangle of the key space.
    """
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in zorder_cols],
        *[F.max(c).alias(f"__max_{c}") for c in zorder_cols],
    ).collect()[0]
    mins = [F.lit(stats[f"__min_{c}"]) for c in zorder_cols]
    maxs = [F.lit(stats[f"__max_{c}"]) for c in zorder_cols]
    z = zorder_value([F.col(c) for c in zorder_cols], mins, maxs, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_overlapping(path: str, col: str, lo, hi) -> tuple[int, int]:
    """Footer-level pruning measurement: (files whose [min,max] range of
    ``col`` overlaps [lo, hi], total files). What Spark's scan skips via
    parquet statistics, counted explicitly for tests/benchmarks."""
    import glob

    import pyarrow.parquet as pq

    total = 0
    overlap = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        total += 1
        if fmin is None or (fmax >= lo and fmin <= hi):
            overlap += 1
    return overlap, total
