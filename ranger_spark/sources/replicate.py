"""Key-shifted table replication: scale a synthetic dataset N× while
keeping join fan-out realistic.

Each replica shifts its join keys by ``replica_index * KEY_STRIDE`` so a
fact row joins only its own replica's dimension rows (16× data → 16× join
output, not 256×). Pure-dimension tables (nation/region/supplier/part)
keep their original cardinality — at 100 TB those stay broadcast-sized
while facts grow, which is exactly the shape this replication preserves.

Used by tools/scale_smoke.py (plan-health sweep) and bench.py (the
data-dominated benchmark regime).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ranger_spark.tables import TABLES, load

# keys that must stay unique per replica for realistic join fan-out
SHIFT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "supplier": [],
    "part": [],
    "nation": [],
    "region": [],
}
KEY_STRIDE = 100_000_000
_DIM_TABLES = ("nation", "region", "supplier", "part")


def build_replicated(
    spark: SparkSession, src_dir: str, out_dir: str, factor: int
) -> None:
    """Write a factor×-replicated copy of every table under out_dir."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        df = load(spark, src_dir, t)
        if t in _DIM_TABLES:
            df.write.parquet(f"{out_dir}/{t}.parquet")
            continue
        reps = F.explode(
            F.array(*[F.lit(i) for i in range(factor)])
        ).alias("__rep")
        rdf = df.select("*", reps)
        for k in SHIFT_KEYS[t]:
            rdf = rdf.withColumn(
                k, F.col(k) + F.col("__rep").cast("long") * KEY_STRIDE
            )
        # cross-references (o_custkey ↔ c_custkey, l_orderkey ↔ o_orderkey)
        # stay consistent: both sides shift by the same stride per replica
        rdf.drop("__rep").repartition(32).write.parquet(
            f"{out_dir}/{t}.parquet"
        )


def is_built(out_dir: str) -> bool:
    return all(
        os.path.exists(f"{out_dir}/{t}.parquet/_SUCCESS") for t in TABLES
    )
