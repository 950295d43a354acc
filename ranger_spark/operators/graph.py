"""Iterative graph algorithms over edge DataFrames.

The reference has no graph surface; this exists for the corpus-curation
uses a training-data pipeline actually has — ranking crawl domains by
link authority (the CommonCrawl-style seed-prioritization signal) and
scoring hosts before sampling. Everything is expressed as joins +
aggregates so Catalyst distributes it; iteration count is a bounded
driver-side loop exactly like operators/dedup.connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count, returning
    (node, rank). Fixed (rather than convergence-tested) rounds keep the
    result exactly reproducible on any engine — the DuckDB oracle
    unrolls the same five steps — and in practice domain ranking uses a
    bounded round budget anyway.

    Distributed shape: per round, one join of the edge list with the
    current rank vector on src (both hash-partitioned on the join key)
    and one aggregate on dst — rank state is O(nodes) and never
    driver-resident; only the node COUNT (one scalar) is collected.
    ``localCheckpoint`` truncates lineage each round so the plan stays
    flat at any iteration budget. Dangling nodes (no out-edges) leak
    their mass, the standard simplification; callers that need strict
    probability conservation add the dangling-redistribution term.
    """
    w = (
        F.col(weight).cast("double")
        if weight
        else F.lit(1.0)
    )
    from pyspark.sql import Window

    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w.alias("__w")
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # one scalar — |domains|, bounded
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    # out-weight normalization as a window sum — one shuffle on __src,
    # no self-join (whose shared lineage trips AMBIGUOUS_REFERENCE)
    norm = e.select(
        "__src",
        "__dst",
        (F.col("__w") / F.sum("__w").over(Window.partitionBy("__src"))).alias(
            "__p"
        ),
    )
    for _ in range(iterations):
        contrib = (
            norm.join(ranks, norm["__src"] == ranks["node"])
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("__p") * F.col("rank")).alias("__c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("__c", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
