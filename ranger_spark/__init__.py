"""ranger_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of gear6io/ranger (reference: /root/reference,
snapshot 2025-09-12), re-expressed Spark-first.

The reference is an Iceberg-native warehouse whose SELECT surface executes on
an embedded DuckDB (reference: server/query/duckdb/engine.go:121) behind a
hand-written parser gate (server/query/parser/parser.go). This package
provides the same capabilities on Spark:

- ``ranger_spark.session``   — SparkSession factory tuned for both local test
  runs and large-cluster deployment (AQE, adaptive skew-join, Arrow).
- ``ranger_spark.types``     — the Iceberg-only type system of the reference
  (server/types/iceberg_types.go) → Spark ``StructType``.
- ``ranger_spark.engine``    — statement router + DDL/DML executors + system
  views mirroring server/query/engine.go semantics.
- ``ranger_spark.queries``   — the operator inventory of SURVEY.md §2 as
  DataFrame builders, each paired with an ANSI-SQL oracle.
- ``ranger_spark.operators`` — large-scale training-data pipeline operators
  (dedup, similarity search, text analysis, multimodal) designed for 100 TB.
- ``ranger_spark.streaming`` — Structured Streaming ingest ≈ the reference's
  chunked batch ingest; ``streaming.astha`` is the Astha CDC scheduler
  (server/astha/) over the snapshot-manifest chain.
- ``ranger_spark.gateway``   — lifecycle manager for the three protocol
  servers (HTTP / pgwire "JDBC" / native) over one engine
  (server/gateway/gateway.go) + the server composition root.
- ``ranger_spark.security``  — opt-in statement whitelist / blocked-keyword /
  injection-pattern validation (duckdb/engine.go:613-706).
- ``ranger_spark.client``    — SDK (Query/Exec/PrepareBatch/AsyncInsert) and
  the CLI client's higher-level operations (client/client.go).
"""

__version__ = "0.1.0"

# Primary entry points: a user of the reference switches to
#   from ranger_spark import Engine, get_spark
#   engine = Engine(get_spark()); engine.execute("SELECT ...;")
# (imported lazily to keep `import ranger_spark` free of pyspark cost)


def __getattr__(name):
    if name == "Engine":
        from ranger_spark.engine import Engine

        return Engine
    if name == "get_spark":
        from ranger_spark.session import get_spark

        return get_spark
    raise AttributeError(name)
