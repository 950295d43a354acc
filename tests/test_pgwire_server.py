"""Postgres-wire simple-query round-trip, speaking the v3 protocol over a
raw socket (no pg client library ships in this container)."""

from __future__ import annotations

import socket
import struct

import pytest


def _startup_packet() -> bytes:
    params = b"user\x00ranger\x00database\x00default\x00\x00"
    body = struct.pack("!I", 196608) + params
    return struct.pack("!I", len(body) + 4) + body


def _query_packet(sql: str) -> bytes:
    payload = sql.encode() + b"\x00"
    return b"Q" + struct.pack("!I", len(payload) + 4) + payload


def _read_messages(sock: socket.socket, until_tag: bytes = b"Z"):
    msgs = []
    buf = b""
    while True:
        while len(buf) < 5:
            chunk = sock.recv(4096)
            if not chunk:
                return msgs
            buf += chunk
        tag = buf[:1]
        (length,) = struct.unpack("!I", buf[1:5])
        while len(buf) < 1 + length:
            buf += sock.recv(4096)
        msgs.append((tag, buf[5 : 1 + length]))
        buf = buf[1 + length :]
        if tag == until_tag:
            return msgs


@pytest.fixture(scope="module")
def pg(engine):
    from ranger_spark.sources.pgwire_server import serve

    srv = serve(engine)
    yield srv
    srv.shutdown()


def _connect(port) -> socket.socket:
    s = socket.create_connection(("127.0.0.1", port), timeout=30)
    s.sendall(_startup_packet())
    msgs = _read_messages(s)
    tags = [t for t, _ in msgs]
    assert b"R" in tags and b"Z" in tags  # AuthenticationOk … ReadyForQuery
    return s


def test_pgwire_select_roundtrip(pg, engine):
    engine.execute("CREATE DATABASE IF NOT EXISTS pgt;")
    engine.execute("DROP TABLE IF EXISTS pgt.t;")
    engine.execute("CREATE TABLE pgt.t (id int32, name string);")
    engine.execute("INSERT INTO pgt.t (id, name) VALUES (1, 'a'), (2, NULL);")

    s = _connect(pg.port)
    s.sendall(_query_packet("SELECT id, name FROM pgt.t ORDER BY id"))
    msgs = _read_messages(s)
    by_tag: dict[bytes, list[bytes]] = {}
    for t, body in msgs:
        by_tag.setdefault(t, []).append(body)
    # RowDescription names both columns
    assert b"id\x00" in by_tag[b"T"][0] and b"name\x00" in by_tag[b"T"][0]
    assert len(by_tag[b"D"]) == 2
    # row 1: "1","a"; row 2 has a NULL (length -1)
    assert b"1" in by_tag[b"D"][0] and b"a" in by_tag[b"D"][0]
    assert struct.pack("!i", -1) in by_tag[b"D"][1]
    assert by_tag[b"C"][0].startswith(b"SELECT 2")

    # DDL over the wire → CommandComplete, no row description
    s.sendall(_query_packet("BEGIN;"))
    msgs = _read_messages(s)
    tags = [t for t, _ in msgs]
    assert b"C" in tags and b"T" not in tags

    # errors → ErrorResponse then ReadyForQuery (connection stays usable)
    s.sendall(_query_packet("VACUUM nope"))
    msgs = _read_messages(s)
    assert any(t == b"E" for t, _ in msgs)
    s.sendall(_query_packet("SELECT 42 AS x"))
    msgs = _read_messages(s)
    assert any(t == b"D" and b"42" in body for t, body in msgs)
    s.sendall(b"X")
    s.close()
    engine.spark.sql("DROP DATABASE pgt CASCADE")


def test_pgwire_rejects_oversized_frame(pg):
    # ADVICE r1: the 4-byte length is client-controlled; a multi-GB claim
    # must be rejected before allocation, not honored
    s = _connect(pg.port)
    s.sendall(b"Q" + struct.pack("!I", 2**31 - 1))  # 2 GiB declared, no body
    msgs = _read_messages(s, until_tag=b"E")
    assert any(t == b"E" and b"bad frame length" in body for t, body in msgs)
    s.close()


def test_pgwire_mid_message_disconnect_is_clean(pg):
    # client dies after the header: server must close quietly, and the
    # listener must keep serving new connections
    s = _connect(pg.port)
    s.sendall(b"Q" + struct.pack("!I", 100))  # promises 96 bytes, sends none
    s.close()
    s2 = _connect(pg.port)
    s2.sendall(_query_packet("SELECT 1 AS one"))
    msgs = _read_messages(s2)
    assert any(t == b"D" for t, _ in msgs)
    s2.close()
