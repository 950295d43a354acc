"""Catalog backends: sqlite and rest (json is exercised everywhere else)
≈ reference catalog/factory_test.go + catalog/rest/catalog_test.go —
each mode must carry the same namespace/table surface."""

from __future__ import annotations

import tempfile

import pytest


def test_sqlite_store_roundtrip():
    from ranger_spark.catalog import SqliteCatalogStore

    path = tempfile.mktemp(suffix=".db")
    store = SqliteCatalogStore(path)
    assert store.load() == {"databases": [], "tables": {}}

    def _setup(m):
        m["databases"].append("db1")
        m["tables"]["db1.t"] = {"columns": [["id", "int32", True]]}

    store.mutate(_setup)
    # a brand-new store handle sees the committed state (durability)
    again = SqliteCatalogStore(path)
    m = again.load()
    assert m["databases"] == ["db1"]
    assert m["tables"]["db1.t"]["columns"] == [["id", "int32", True]]


def test_sqlite_store_concurrent_mutations():
    import threading

    from ranger_spark.catalog import SqliteCatalogStore

    path = tempfile.mktemp(suffix=".db")
    store = SqliteCatalogStore(path)

    def add(i):
        SqliteCatalogStore(path).mutate(
            lambda m: m["databases"].append(f"db{i}")
        )

    ts = [threading.Thread(target=add, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(store.load()["databases"]) == sorted(
        f"db{i}" for i in range(8)
    )


def test_engine_on_sqlite_catalog(spark):
    from ranger_spark.engine import Engine

    spark.conf.set("spark.ranger.catalog.type", "sqlite")
    try:
        e = Engine(spark)
        e.execute("CREATE DATABASE IF NOT EXISTS sqcat;")
        e.execute("DROP TABLE IF EXISTS sqcat.t;")
        e.execute("CREATE TABLE sqcat.t (id int32, v string);")
        e.execute("INSERT INTO sqcat.t (id, v) VALUES (1, 'a');")
        assert e.execute("SELECT v FROM sqcat.t;").rows == [("a",)]
        # durable across engine instances: recover() after catalog loss
        spark.sql("DROP TABLE sqcat.t")
        fresh = Engine(spark)
        assert fresh.recover() >= 1
        assert fresh.execute("SELECT v FROM sqcat.t;").rows == [("a",)]
        fresh.execute("DROP TABLE sqcat.t;")
        fresh.execute("DROP DATABASE sqcat CASCADE;")
    finally:
        spark.conf.unset("spark.ranger.catalog.type")


@pytest.fixture(scope="module")
def rest_catalog():
    from ranger_spark.catalog import JsonCatalogStore, serve_catalog

    store = JsonCatalogStore(tempfile.mktemp(suffix=".json"))
    srv, port = serve_catalog(store)
    yield f"http://127.0.0.1:{port}", store
    srv.shutdown()


def test_rest_catalog_http_crud(rest_catalog):
    # direct protocol-level CRUD ≈ reference rest catalog surface
    import requests

    base, _store = rest_catalog
    assert requests.get(f"{base}/v1/config").status_code == 200
    requests.post(
        f"{base}/v1/namespaces", json={"namespace": ["crud"]}
    ).raise_for_status()
    assert ["crud"] in requests.get(f"{base}/v1/namespaces").json()[
        "namespaces"
    ]
    entry = {"columns": [["id", "int64", True]], "location": "/x"}
    requests.post(
        f"{base}/v1/namespaces/crud/tables",
        json={"name": "t1", "metadata": entry},
    ).raise_for_status()
    got = requests.get(f"{base}/v1/namespaces/crud/tables/t1").json()
    assert got["metadata"] == entry
    ids = requests.get(f"{base}/v1/namespaces/crud/tables").json()[
        "identifiers"
    ]
    assert {"namespace": ["crud"], "name": "t1"} in ids
    requests.delete(
        f"{base}/v1/namespaces/crud/tables/t1"
    ).raise_for_status()
    assert (
        requests.get(f"{base}/v1/namespaces/crud/tables/t1").status_code
        == 404
    )
    requests.delete(f"{base}/v1/namespaces/crud").raise_for_status()
    assert ["crud"] not in requests.get(f"{base}/v1/namespaces").json()[
        "namespaces"
    ]


def test_engine_on_rest_catalog(spark, rest_catalog):
    from ranger_spark.engine import Engine

    base, store = rest_catalog
    spark.conf.set("spark.ranger.catalog.type", "rest")
    spark.conf.set("spark.ranger.catalog.uri", base)
    try:
        e = Engine(spark)
        e.execute("CREATE DATABASE IF NOT EXISTS restcat;")
        e.execute("DROP TABLE IF EXISTS restcat.t;")
        e.execute("CREATE TABLE restcat.t (id int32, v string);")
        e.execute("INSERT INTO restcat.t (id, v) VALUES (7, 'r');")
        assert e.execute("SELECT id, v FROM restcat.t;").rows == [(7, "r")]
        # the DDL landed in the remote store, not a local file
        remote = store.load()
        assert "restcat" in remote["databases"]
        assert "restcat.t" in remote["tables"]
        # catalog loss + fresh engine: recovery reads through REST
        spark.sql("DROP TABLE restcat.t")
        fresh = Engine(spark)
        assert fresh.recover() >= 1
        assert fresh.execute("SELECT v FROM restcat.t;").rows == [("r",)]
        fresh.execute("DROP TABLE restcat.t;")
        assert "restcat.t" not in store.load()["tables"]
        fresh.execute("DROP DATABASE restcat CASCADE;")
        assert "restcat" not in store.load()["databases"]
    finally:
        spark.conf.unset("spark.ranger.catalog.type")
        spark.conf.unset("spark.ranger.catalog.uri")


def test_rest_catalog_spec_load_table_result(spark, rest_catalog):
    """Iceberg-REST spec shape (r8): LoadTable returns metadata-location
    + the table's REAL emitted Iceberg v2 metadata for versioned tables,
    HEAD existence checks answer 204/404, GetNamespace answers — so an
    external spec-reading client can attach and follow the metadata
    pointer without knowing anything engine-specific."""
    import json

    import requests

    from ranger_spark.engine import Engine

    base, store = rest_catalog
    spark.conf.set("spark.ranger.catalog.type", "rest")
    spark.conf.set("spark.ranger.catalog.uri", base)
    try:
        e = Engine(spark)
        e.execute("CREATE DATABASE IF NOT EXISTS speccat;")
        e.execute("DROP TABLE IF EXISTS speccat.t;")
        e.execute("CREATE TABLE speccat.t (id int32, v string);")
        e.execute("INSERT INTO speccat.t (id, v) VALUES (1, 'x');")

        # HEAD existence (spec): table and namespace
        assert (
            requests.head(f"{base}/v1/namespaces/speccat/tables/t").status_code
            == 204
        )
        assert (
            requests.head(f"{base}/v1/namespaces/speccat/tables/nope").status_code
            == 404
        )
        assert requests.head(f"{base}/v1/namespaces/speccat").status_code == 204
        # GetNamespace
        ns = requests.get(f"{base}/v1/namespaces/speccat").json()
        assert ns["namespace"] == ["speccat"]

        # LoadTableResult: spec keys + real Iceberg v2 metadata
        body = requests.get(f"{base}/v1/namespaces/speccat/tables/t").json()
        assert body["ranger-entry"]["columns"][0][0] == "id"
        meta = body["metadata"]
        assert meta["format-version"] == 2
        assert meta["snapshots"], "committed INSERT must appear as a snapshot"
        loc = body["metadata-location"]
        with open(loc) as f:  # the pointer resolves to the same document
            on_disk = json.load(f)
        assert on_disk["current-snapshot-id"] == meta["current-snapshot-id"]
        # schema travels in spec form
        fields = {f_["name"] for f_ in meta["schemas"][0]["fields"]}
        assert {"id", "v"} <= fields

        e.execute("DROP TABLE speccat.t;")
        e.execute("DROP DATABASE speccat CASCADE;")
    finally:
        spark.conf.unset("spark.ranger.catalog.type")
        spark.conf.unset("spark.ranger.catalog.uri")
