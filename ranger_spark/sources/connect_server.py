"""Network surface: Spark Connect gRPC endpoint.

The reference fronts its engine with three wire protocols (HTTP JSON,
Postgres-wire, native TCP — reference server/protocols/). The Spark-native
equivalent is Spark Connect: starting the session with the
SparkConnectPlugin exposes the full SQL surface (and therefore every
query/DDL path in this repo) over gRPC on port 15002 to any Connect
client (Python/Scala/Go/JDBC-over-connect).

This container ships the server jar (spark-connect_2.13) but not
grpcio — so since r10 the endpoint is driven END-TO-END by the
pure-Python gRPC client in sources/connect_client.py (HTTP/2 + HPACK
+ protobuf wire format from the public RFCs; the Connect schema ships
as .proto files inside the server jar). tests/test_connect_roundtrip.py
round-trips SQL, real parquet scans, multi-batch >64 KiB Arrow
results, and server-error propagation. A standard client
(``SparkSession.builder.remote("sc://host:15002")``) works identically
where pyspark[connect] is installed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ranger_spark.session import get_spark

CONNECT_PLUGIN = "org.apache.spark.sql.connect.SparkConnectPlugin"
DEFAULT_PORT = 15002


def serve(port: int = DEFAULT_PORT, cpus: int | None = None) -> SparkSession:
    """Start a SparkSession with the Connect gRPC endpoint enabled."""
    return get_spark(
        "ranger_spark_connect",
        cpus=cpus,
        extra_conf={
            "spark.plugins": CONNECT_PLUGIN,
            "spark.connect.grpc.binding.port": str(port),
        },
    )


def is_listening(port: int = DEFAULT_PORT, host: str = "127.0.0.1") -> bool:
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.settimeout(2)
        return s.connect_ex((host, port)) == 0
