"""Training-data export: token-budget JSONL shards + manifest.

The last stage of an LLM data pipeline writes the curated corpus as
fixed-size shards of JSONL (one doc per line) plus a manifest the
trainer's data loader consumes. The plan half (queries/pipeline.py
``export_shard_plan``) assigns each doc a (source, shard_id) by running
cumulative token count; this module materializes it:

- shard assignment is a window over (source, doc_id) — deterministic,
  re-runs produce byte-identical shards;
- the write is ``repartition(source, shard_id) → partitionBy`` so each
  shard lands in exactly ONE file under ``source=<s>/shard_id=<n>/``
  (the repartition and the directory layout share the keys);
- the returned manifest (one row per shard: doc/token counts, doc-id
  range) is also written as ``_manifest.jsonl`` at the root.

At 100 TB this is the idiomatic Spark export shape: the text moves once
(map-side JSON encode, shuffle by shard key, write), and shard sizes
are bounded by the token budget rather than file-count guesses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_shards(
    docs: DataFrame,
    token_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    budget_tokens: int = 500,
) -> DataFrame:
    """Add a ``shard_id`` column: per source, docs in stable id order
    pack greedily into shards whose RUNNING token total crosses budget
    multiples. A single doc larger than the budget gets its own shard
    (the floor() of its starting offset), never splits."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return docs.withColumn(
        "shard_id",
        F.floor(
            (F.sum(token_col).over(w) - F.col(token_col))
            / F.lit(float(budget_tokens))
        ).cast("bigint"),
    )


def export_jsonl_shards(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget_tokens: int = 500,
) -> DataFrame:
    """Write ``docs`` (id, source, text, n_tokens) as token-budget JSONL
    shards under ``out_dir`` and return the shard manifest DataFrame.
    One file per shard; doc order inside a shard follows ``id_col``
    (sortWithinPartitions — the shard is one partition by construction).
    """
    sharded = plan_shards(
        docs.select(id_col, source_col, text_col, token_col),
        token_col, source_col, id_col, budget_tokens,
    )
    (
        sharded.repartition(source_col, "shard_id")
        .sortWithinPartitions(source_col, "shard_id", id_col)
        .write.mode("overwrite")
        .partitionBy(source_col, "shard_id")
        .json(out_dir)
    )
    manifest = (
        sharded.groupBy(source_col, "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).cast("bigint").alias("shard_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .orderBy(source_col, "shard_id")
    )
    rows = [r.asDict() for r in manifest.collect()]  # |shards| rows — bounded
    import json

    with open(os.path.join(out_dir, "_manifest.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    return manifest
