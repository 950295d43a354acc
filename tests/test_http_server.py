"""HTTP JSON protocol round-trip (≈ reference protocols/http tests)."""

from __future__ import annotations

import json
import urllib.request


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/query",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as resp:
        return resp.status, json.loads(resp.read())


def test_http_concurrent_queries(engine):
    from concurrent.futures import ThreadPoolExecutor

    from ranger_spark.sources.http_server import serve

    srv, port = serve(engine)
    try:
        def run(i):
            code, r = _post(
                port, {"query": f"SELECT {i} AS n, count(*) AS c FROM range(100);"}
            )
            return code, r["data"][0]

        with ThreadPoolExecutor(8) as ex:
            results = list(ex.map(run, range(16)))
        assert all(code == 200 for code, _ in results)
        assert sorted(row[0] for _, row in results) == list(range(16))
        assert all(row[1] == 100 for _, row in results)
    finally:
        srv.shutdown()


def test_http_query_lifecycle(engine):
    from ranger_spark.sources.http_server import serve

    srv, port = serve(engine)
    try:
        h = _get(port, "/health")[1]
        assert h["status"] == "ok" and h["health"] == "healthy"
        info = _get(port, "/info")[1]
        assert info["engine"] == "ranger_spark" and info["spark_version"]

        code, r = _post(port, {"query": "CREATE DATABASE IF NOT EXISTS htest;"})
        assert code == 200
        _post(port, {"query": "USE htest;"})
        _post(port, {"query": "DROP TABLE IF EXISTS ht;"})
        _post(port, {"query": "CREATE TABLE ht (id int32, name string);"})
        code, r = _post(
            port, {"query": "INSERT INTO ht (id, name) VALUES (1, 'a'), (2, 'b');"}
        )
        assert code == 200 and r["row_count"] == 2
        code, r = _post(port, {"query": "SELECT name FROM ht ORDER BY id;"})
        assert code == 200
        assert r["columns"] == ["name"] and r["data"] == [["a"], ["b"]]
        assert r["query_id"]

        # error shapes: gate violation vs bad body
        code, r = _post(port, {"query": "SELECT 1"})  # no semicolon
        assert code == 400 and r["code"] == "parser.missing_semicolon"
        code, r = _post(port, {"nope": 1})
        assert code == 400 and "query" in r["error"]

        status = _get(port, "/status")[1]
        assert status["queries_total"] >= 5
        engine.spark.sql("DROP DATABASE htest CASCADE")
    finally:
        srv.shutdown()


def test_http_query_via_url_param_and_database_field(engine):
    """Reference-shape requests: the statement rides the URL parameter
    ?q= (server/protocols/http/server.go:92); the JSON body also accepts
    an optional 'database' that scopes unqualified names per-statement."""
    import json as _json
    import urllib.parse
    import urllib.request

    from ranger_spark.sources.http_server import serve

    srv, port = serve(engine)
    try:
        engine.execute("USE default;")  # a prior test may have dropped its db
        engine.execute("CREATE DATABASE IF NOT EXISTS hq;")
        engine.execute("DROP TABLE IF EXISTS hq.t;")
        engine.execute("CREATE TABLE hq.t (id int32);")
        engine.execute("INSERT INTO hq.t (id) VALUES (41);")
        # reference shape: ?q=, empty body
        q = urllib.parse.quote("SELECT id FROM hq.t;")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query?q={q}", method="POST", data=b""
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = _json.loads(resp.read())
        assert out["data"] == [[41]]
        # JSON body with database scoping an unqualified name
        body = _json.dumps({"query": "SELECT id FROM t;", "database": "hq"}).encode()
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/query", method="POST", data=body
        )
        with urllib.request.urlopen(req2, timeout=60) as resp:
            out2 = _json.loads(resp.read())
        assert out2["data"] == [[41]]
    finally:
        srv.shutdown()
        srv.server_close()
        engine.spark.sql("DROP DATABASE hq CASCADE")


def test_http_reference_response_shape(engine):
    """A client written against the reference's handler reads
    status/query/rowCount/timestamp (server.go:119-126) and
    /status's {status:running, server:http} (server.go:154)."""
    from ranger_spark.sources.http_server import serve

    srv, port = serve(engine)
    try:
        engine.execute("USE default;")
        code, r = _post(port, {"query": "SELECT 1 AS one;"})
        assert code == 200
        assert r["status"] == "success" and r["rowCount"] == 1
        assert r["query"].startswith("SELECT 1") and "timestamp" in r
        assert r["row_count"] == 1  # repo shape stays
        st = _get(port, "/status")[1]
        assert st["status"] == "running" and st["server"] == "http"
    finally:
        srv.shutdown()
        srv.server_close()
