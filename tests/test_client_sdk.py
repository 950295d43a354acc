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


def test_lakehouse_client_operations(client, engine, tmp_path):
    """The reference CLI client's higher-level methods
    (client/client.go:97-338): namespace + table management and parquet
    file import, each the reference's thin SQL wrapper (import expressed
    as CTAS/INSERT...SELECT because the reference's own COPY emission is
    blocked by its server — see LakehouseClient docstring)."""
    from ranger_spark.client import LakehouseClient

    lc = LakehouseClient(client)
    lc.create_namespace("lkh")
    assert "lkh" in lc.list_namespaces()
    client.exec("USE lkh;")
    # build a parquet file to import
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = str(tmp_path / "people.parquet")
    pq.write_table(
        pa.table({"id": [1, 2, 3], "name": ["a", "b", "c"]}), f
    )
    lc.import_file(f, "lkh.people")  # table absent → CTAS
    assert "people" in lc.list_tables()
    schema = lc.describe_table("lkh.people")
    assert ("id", "int64") in schema or ("id", "bigint") in [
        (n, t.lower()) for n, t in schema
    ]
    r = lc.execute_query("SELECT count(*) AS n FROM lkh.people;")
    assert r.rows[0][0] == 3
    lc.import_file(f, "lkh.people")  # append
    assert lc.execute_query(
        "SELECT count(*) AS n FROM lkh.people;"
    ).rows[0][0] == 6
    lc.import_file(f, "lkh.people", overwrite=True)  # replace
    assert lc.execute_query(
        "SELECT count(*) AS n FROM lkh.people;"
    ).rows[0][0] == 3
    with pytest.raises(Exception):
        lc.import_file("/bad'path.parquet", "lkh.people")
    lc.drop_table("lkh.people")
    assert "people" not in lc.list_tables()
    engine.spark.sql("DROP DATABASE lkh CASCADE")


def test_ranger_cli_commands(client, engine, capsys):
    """The cmd/client CLI shape (main.go subcommands) over the HTTP
    endpoint, driven through its main() with an injected URL."""
    import tools.ranger_cli as cli

    url = client.url
    assert cli.main(["--url", url, "catalog", "create", "clidb"]) == 0
    assert cli.main(["--url", url, "query",
                     "CREATE TABLE clidb.t (id int32);"]) == 0
    assert cli.main(["--url", url, "query",
                     "INSERT INTO clidb.t (id) VALUES (7);"]) == 0
    assert cli.main(["--url", url, "query",
                     "SELECT id FROM clidb.t;"]) == 0
    out = capsys.readouterr().out
    assert "7" in out and "(1 rows)" in out
    assert cli.main(["--url", url, "table", "describe", "clidb.t"]) == 0
    assert "id" in capsys.readouterr().out
    assert cli.main(["--url", url, "table", "drop", "clidb.t"]) == 0
    assert cli.main(["--url", url, "catalog", "list"]) == 0
    assert "clidb" in capsys.readouterr().out
    # errors exit 1 with a message, not a traceback
    assert cli.main(["--url", url, "query", "SELECT * FROM clidb.nope;"]) == 1
    engine.spark.sql("DROP DATABASE clidb CASCADE")
