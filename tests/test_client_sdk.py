"""Client SDK round-trip against the HTTP server (≈ reference
pkg/sdk/integration_tests)."""

from __future__ import annotations

import pytest

from ranger_spark.client import RangerClient, RangerClientError


@pytest.fixture(scope="module")
def client(engine):
    from ranger_spark.sources.http_server import serve

    srv, port = serve(engine)
    c = RangerClient(f"http://127.0.0.1:{port}")
    yield c
    srv.shutdown()


def test_sdk_lifecycle(client, engine):
    assert client.ping()
    client.exec("CREATE DATABASE IF NOT EXISTS sdktest;")
    client.exec("DROP TABLE IF EXISTS sdktest.t;")
    client.exec("CREATE TABLE sdktest.t (id int32 NOT NULL, name string);")

    batch = client.prepare_batch("sdktest.t", ["id", "name"])
    batch.append(1, "a'quote")
    batch.append(2, None)
    assert len(batch) == 2
    r = batch.send()
    assert r.row_count == 2 and len(batch) == 0

    res = client.query("SELECT id, name FROM sdktest.t ORDER BY id;")
    assert res.columns == ["id", "name"]
    assert res.rows == [[1, "a'quote"], [2, None]]

    # async insert
    t = client.async_insert("sdktest.t", ["id", "name"], [(3, "c"), (4, "d")])
    t.join(120)
    assert t.error is None and t.result.row_count == 2
    assert client.query("SELECT count(*) AS n FROM sdktest.t;").rows == [[4]]

    # server-side strict batch-reject propagates as a client error with code
    bad = client.prepare_batch("sdktest.t", ["id", "name"])
    bad.append(None, "x")
    with pytest.raises(RangerClientError) as ei:
        bad.send()
    assert ei.value.code == "storage.validation_failed"

    # arity enforced client-side like the reference SDK batch
    b2 = client.prepare_batch("sdktest.t", ["id", "name"])
    with pytest.raises(RangerClientError):
        b2.append(1)
    engine.spark.sql("DROP DATABASE sdktest CASCADE")
