"""Spark Connect driven END-TO-END with the pure-Python gRPC client —
the surface that had been boot-only since round 1 (grpcio absent).

Server + client run in one subprocess (the Connect plugin must be set
at JVM/session creation, so it cannot share the test fixture's JVM);
the test asserts on structured stdout. Protocol-layer units (protobuf
wire helpers, HPACK, gRPC framing) run in-process below.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

from ranger_spark.sources.connect_client import (
    HpackDecoder,
    _grpc_messages,
    _ld,
    _s,
    _uvarint,
    hpack_encode,
    pb_fields,
)

SCRIPT = """
import sys, time
sys.path.insert(0, "/root/repo")
from ranger_spark.sources.connect_server import serve, is_listening
from ranger_spark.sources.connect_client import ConnectClient, GrpcError
spark = serve(port=15097, cpus=4)
for _ in range(60):
    if is_listening(15097):
        break
    time.sleep(0.5)
c = ConnectClient(port=15097)

t = c.sql("SELECT 1 AS one, 'hello' AS greeting")
assert t.to_pydict() == {"one": [1], "greeting": ["hello"]}, t
print("SIMPLE_OK")

# real parquet over the Connect path
t = c.sql(
    "SELECT r_regionkey, r_name FROM "
    "parquet.`/root/testdata/sf0.001/region.parquet` ORDER BY r_regionkey"
)
assert t.num_rows == 5 and t.column("r_name")[0].as_py() == "AFRICA", t
print("PARQUET_OK")

# large multi-batch result: >> 64 KiB exercises HTTP/2 flow control
t = c.sql("SELECT id, id * 2 AS dbl, uuid() AS u FROM range(200000)")
assert t.num_rows == 200000
assert sum(t.column("dbl").to_pylist()[:5]) == 0 + 2 + 4 + 6 + 8
print("LARGE_OK", t.num_rows)

# aggregation + join shape through Connect
t = c.sql(
    "SELECT n.col2 AS name, count(*) AS cnt FROM VALUES (0,'a'),(1,'b') n "
    "GROUP BY n.col2 ORDER BY name"
)
assert t.column("cnt").to_pylist() == [1, 1]
print("AGG_OK")

# AnalyzePlan RPCs: version + schema-without-execution
v = c.spark_version()
assert v.startswith("4."), v
tree = c.schema_tree("SELECT 1 AS one, 'x' AS s")
assert "one: integer" in tree and "s: string" in tree, tree
print("ANALYZE_OK", v)

# Config RPC: session-scoped set/get, visible to SQL in the session
c.set_conf("spark.sql.shuffle.partitions", "7")
assert c.get_conf("spark.sql.shuffle.partitions") == "7"
t = c.sql("SET spark.sql.shuffle.partitions")
assert t.column("value").to_pylist() == ["7"], t.to_pydict()
print("CONFIG_OK")

# Interrupt RPC: cancel a running execution from another connection
import threading
res = {}
def long_query():
    try:
        c2 = ConnectClient(port=15097)
        c2.session_id = c.session_id
        c2.sql("SELECT count(*) FROM range(2000000000) a, range(200) b")
        res["done"] = "finished"
    except GrpcError as e:
        res["done"] = "interrupted" if "CANCELED" in str(e).upper() else str(e)[:80]
th = threading.Thread(target=long_query); th.start()
time.sleep(3)
ids = c.interrupt_all()
th.join(timeout=90)
assert res.get("done") == "interrupted", res
assert len(ids) >= 1, ids
print("INTERRUPT_OK")

# the CLI's sc:// mode drives the same stack
import subprocess
r = subprocess.run(
    [sys.executable, "/root/repo/tools/ranger_cli.py",
     "--url", "sc://127.0.0.1:15097", "query", "SELECT 41 + 1 AS answer"],
    capture_output=True, text=True, timeout=120)
assert r.returncode == 0 and "42" in r.stdout, (r.stdout, r.stderr[-200:])
print("CLI_OK")

# server-side error surfaces as a client exception
try:
    c.sql("SELECT definitely_not_a_column FROM range(1)")
    print("ERROR_NOT_RAISED")
except GrpcError:
    print("ERROR_OK")
except Exception as e:
    print("ERROR_WRONG_TYPE", type(e).__name__)

spark.stop()
print("DONE")
"""


def test_connect_sql_round_trips_end_to_end():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
    )
    tail = out.stdout[-2000:] + out.stderr[-1500:]
    for marker in ("SIMPLE_OK", "PARQUET_OK", "LARGE_OK", "AGG_OK",
                   "ANALYZE_OK", "CONFIG_OK", "INTERRUPT_OK", "CLI_OK",
                   "ERROR_OK", "DONE"):
        assert marker in out.stdout, f"missing {marker}: {tail}"


# ------------------------------------------------------- protocol units
def test_protobuf_wire_round_trip():
    msg = _s(1, "sess") + _ld(2, _s(1, "user")) + _ld(3, _ld(1, _ld(10, _s(1, "SELECT 1"))))
    fields = {f: v for f, _, v in pb_fields(msg)}
    assert fields[1] == b"sess"
    inner = {f: v for f, _, v in pb_fields(fields[3])}
    rel = {f: v for f, _, v in pb_fields(inner[1])}
    sql = {f: v for f, _, v in pb_fields(rel[10])}
    assert sql[1] == b"SELECT 1"


def test_uvarint_boundaries():
    for n in (0, 1, 127, 128, 300, 2**21, 2**35):
        enc = _uvarint(n)
        from ranger_spark.sources.connect_client import _read_uvarint

        v, i = _read_uvarint(enc, 0)
        assert v == n and i == len(enc)


def test_hpack_encode_decode_self_consistent():
    headers = [
        (":method", "POST"), (":scheme", "http"),
        (":path", "/spark.connect.SparkConnectService/ExecutePlan"),
        (":authority", "localhost:15002"),
        ("content-type", "application/grpc"), ("te", "trailers"),
        ("x-custom", "value-123"),
    ]
    block = hpack_encode(headers)
    got = HpackDecoder().decode(block)
    assert got == headers


def test_hpack_decoder_handles_dynamic_table_and_size_update():
    d = HpackDecoder()
    # literal WITH incremental indexing (new name), then indexed ref to it
    block = b"\x40" + bytes([1]) + b"k" + bytes([2]) + b"vv"
    assert d.decode(block) == [("k", "vv")]
    # dynamic entry 1 lives at index 62 (after the 61 static entries)
    assert d.decode(b"\xbe") == [("k", "vv")]
    # size update then an indexed static entry
    assert d.decode(b"\x3f\xe1\x01\x82") == [(":method", "GET")]


def test_grpc_message_framing():
    import struct

    m1, m2 = b"abc", b"defgh"
    data = b"\x00" + struct.pack(">I", 3) + m1 + b"\x00" + struct.pack(">I", 5) + m2
    assert list(_grpc_messages(data)) == [m1, m2]
    with pytest.raises(Exception):
        list(_grpc_messages(b"\x01" + struct.pack(">I", 3) + m1))
