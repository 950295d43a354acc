"""Durable catalog stores: json / sqlite / rest — the reference's three
catalog modes (reference server/catalog/factory.go:23-36 selects
json | sqlite | rest by config; each implements the same iceberg-catalog
namespace/table surface).

The engine's durable state is one manifest::

    {"databases": [name, ...],
     "tables": {"db.tbl": {columns, partition_by, storage, settings,
                           location}, ...}}

and every store exposes the same two operations the engine uses:

- ``load() -> manifest`` — read the full catalog.
- ``mutate(fn) -> manifest`` — atomically apply ``fn(manifest)`` under the
  store's own concurrency control and return the new state.

Backends:

- :class:`JsonCatalogStore` — one flock-guarded JSON file with
  tmp-write + rename publishing (≈ reference catalog/json; equivalent to
  an Iceberg *hadoop* catalog's single metadata pointer).
- :class:`SqliteCatalogStore` — stdlib ``sqlite3`` with ``namespaces`` and
  ``tables`` rows; each mutation is one IMMEDIATE transaction, so
  SQLite's locking provides cross-process serialization exactly as the
  reference's sqlite catalog relies on it (catalog/sqlite/catalog.go).
- :class:`RestCatalogStore` — HTTP *client* against
  :class:`CatalogServer`, speaking an Iceberg-REST-shaped surface
  (``/v1/namespaces``, ``/v1/namespaces/{ns}/tables``, … ≈ reference
  catalog/rest/catalog.go which delegates every op to the remote).
  ``mutate`` diffs the manifest before/after ``fn`` and issues one REST
  call per changed namespace/table — precisely the catalog ops the
  engine performs; each server-side op commits through the backing
  store's own ``mutate``, so the remote store stays consistent under
  concurrent clients.

Select per session with ``spark.ranger.catalog.type`` (default ``json``)
and ``spark.ranger.catalog.uri`` (file path for json/sqlite, base URL for
rest).
"""

from __future__ import annotations

import copy
import fcntl
import json
import os
import sqlite3
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote


class JsonCatalogStore:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    @staticmethod
    def _empty() -> dict:
        return {"databases": [], "tables": {}}

    def load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return self._empty()

    def mutate(self, fn) -> dict:
        """flock-guarded reload → mutate → tmp-write → rename: concurrent
        engines sharing the store never lose each other's entries, and
        readers always see a complete file."""
        with open(self.path + ".lock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                current = self.load()
                fn(current)
                tmp = self.path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(current, f, indent=1)
                os.rename(tmp, self.path)
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)
        return current


class SqliteCatalogStore:
    """Rows, not a blob: one ``namespaces`` row per database and one
    ``tables`` row per table (entry as JSON), mirroring the reference's
    sqlite catalog schema shape (catalog/sqlite/catalog.go:127-160)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with self._connect() as con:
            con.execute(
                "CREATE TABLE IF NOT EXISTS namespaces ("
                "name TEXT PRIMARY KEY)"
            )
            con.execute(
                "CREATE TABLE IF NOT EXISTS tables ("
                "name TEXT PRIMARY KEY, entry TEXT NOT NULL)"
            )

    def _connect(self) -> sqlite3.Connection:
        return sqlite3.connect(self.path, timeout=30, isolation_level=None)

    @staticmethod
    def _read(con: sqlite3.Connection) -> dict:
        dbs = [
            r[0]
            for r in con.execute("SELECT name FROM namespaces ORDER BY name")
        ]
        tables = {
            r[0]: json.loads(r[1])
            for r in con.execute("SELECT name, entry FROM tables")
        }
        return {"databases": dbs, "tables": tables}

    def load(self) -> dict:
        with self._connect() as con:
            return self._read(con)

    def mutate(self, fn) -> dict:
        con = self._connect()
        try:
            # IMMEDIATE takes the write lock up front: the read-modify-
            # write below is serialized across processes by SQLite itself
            con.execute("BEGIN IMMEDIATE")
            current = self._read(con)
            fn(current)
            con.execute("DELETE FROM namespaces")
            con.executemany(
                "INSERT INTO namespaces (name) VALUES (?)",
                [(d,) for d in current["databases"]],
            )
            con.execute("DELETE FROM tables")
            con.executemany(
                "INSERT INTO tables (name, entry) VALUES (?, ?)",
                [(n, json.dumps(e)) for n, e in current["tables"].items()],
            )
            con.execute("COMMIT")
        except BaseException:
            con.execute("ROLLBACK")
            raise
        finally:
            con.close()
        return current


class RestCatalogStore:
    def __init__(self, base_url: str):
        import requests

        self._http = requests
        self.base = base_url.rstrip("/")

    def _url(self, *parts: str) -> str:
        return "/".join([self.base, "v1", *parts])

    def load(self) -> dict:
        ns = self._http.get(self._url("namespaces"), timeout=30).json()[
            "namespaces"
        ]
        dbs = [n[0] for n in ns]
        tables: dict = {}
        for db in dbs:
            ids = self._http.get(
                self._url("namespaces", db, "tables"), timeout=30
            ).json()["identifiers"]
            for ident in ids:
                body = self._http.get(
                    self._url("namespaces", db, "tables", ident["name"]),
                    timeout=30,
                ).json()
                # the engine entry rides the vendor key; "metadata" holds
                # the spec LoadTableResult (real Iceberg metadata) for
                # versioned tables and doubles as the legacy entry shape
                tables[f"{db}.{ident['name']}"] = body.get(
                    "ranger-entry", body.get("metadata")
                )
        return {"databases": dbs, "tables": tables}

    def mutate(self, fn) -> dict:
        before = self.load()
        current = copy.deepcopy(before)
        fn(current)
        for db in current["databases"]:
            if db not in before["databases"]:
                self._http.post(
                    self._url("namespaces"),
                    json={"namespace": [db]},
                    timeout=30,
                ).raise_for_status()
        for name, entry in current["tables"].items():
            if before["tables"].get(name) != entry:
                db, tbl = name.split(".", 1)
                self._http.post(
                    self._url("namespaces", db, "tables"),
                    json={"name": tbl, "metadata": entry},
                    timeout=30,
                ).raise_for_status()
        for name in before["tables"]:
            if name not in current["tables"]:
                db, tbl = name.split(".", 1)
                self._http.delete(
                    self._url("namespaces", db, "tables", tbl), timeout=30
                ).raise_for_status()
        for db in before["databases"]:
            if db not in current["databases"]:
                self._http.delete(
                    self._url("namespaces", db), timeout=30
                ).raise_for_status()
        return current


# ---------------------------------------------------------------- service
class _CatalogHandler(BaseHTTPRequestHandler):
    store: JsonCatalogStore | SqliteCatalogStore  # set by serve_catalog()

    def log_message(self, *a):  # silence per-request stderr noise
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _parts(self) -> list[str]:
        return [unquote(p) for p in self.path.strip("/").split("/") if p]

    def _namespaces(self, manifest: dict) -> list[str]:
        # declared databases plus implicit ones carrying tables (the
        # engine's default database holds tables without a manifest entry)
        implicit = {n.split(".", 1)[0] for n in manifest["tables"]}
        return sorted(set(manifest["databases"]) | implicit)

    def do_GET(self):  # noqa: N802 (http.server API)
        p = self._parts()
        m = self.store.load()
        if p == ["v1", "config"]:
            self._send(200, {"defaults": {}, "overrides": {}})
        elif p == ["v1", "namespaces"]:
            self._send(
                200, {"namespaces": [[n] for n in self._namespaces(m)]}
            )
        elif len(p) == 4 and p[:2] == ["v1", "namespaces"] and p[3] == "tables":
            db = p[2]
            idents = [
                {"namespace": [db], "name": n.split(".", 1)[1]}
                for n in sorted(m["tables"])
                if n.split(".", 1)[0] == db
            ]
            self._send(200, {"identifiers": idents})
        elif len(p) == 5 and p[:2] == ["v1", "namespaces"] and p[3] == "tables":
            entry = m["tables"].get(f"{p[2]}.{p[4]}")
            if entry is None:
                self._send(404, {"error": f"table {p[2]}.{p[4]} not found"})
            else:
                self._send(200, self._load_table_result(entry))
        elif len(p) == 3 and p[:2] == ["v1", "namespaces"]:
            # GetNamespace (spec): namespace + properties
            if p[2] in self._namespaces(m):
                self._send(200, {"namespace": [p[2]], "properties": {}})
            else:
                self._send(404, {"error": f"namespace {p[2]} not found"})
        else:
            self._send(404, {"error": "not found"})

    @staticmethod
    def _load_table_result(entry: dict) -> dict:
        """Iceberg-REST LoadTableResult shape: ``metadata-location`` +
        ``metadata`` carry the table's REAL emitted Iceberg v2 spec
        metadata (sources/iceberg_meta — format-version, schemas,
        snapshots, manifest lists) when the table is snapshot-versioned,
        so a spec-reading external client can follow the pointer; the
        engine's own entry rides the vendor key ``ranger-entry`` (spec
        clients ignore unknown keys, RestCatalogStore reads it)."""
        # ranger-payload-version marks the r8+ shape (engine entry under
        # the vendor key, spec metadata under "metadata"); a pre-r8
        # RestCatalogStore reading body["metadata"] as the engine entry
        # can detect the mismatch instead of mis-parsing Iceberg spec
        # metadata (ADVICE r8; single-repo client+server version
        # together, so this is a marker, not a compat shim).
        resp: dict = {"ranger-entry": entry, "ranger-payload-version": 2,
                      "config": {}}
        try:
            if entry.get("versioned"):
                import os

                from ranger_spark.sources import iceberg_meta
                from ranger_spark.sources.snapshots import VersionedTable

                vt = VersionedTable(entry["location"])
                meta = iceberg_meta.read_metadata(vt)
                if meta is not None:
                    d = iceberg_meta.meta_dir(vt)
                    v = meta.get("current-snapshot-id", 0)
                    loc = os.path.join(d, f"v{v}.metadata.json")
                    if os.path.exists(loc):
                        resp["metadata-location"] = loc
                    resp["metadata"] = meta
        except Exception:  # spec projection is additive, never a 500
            pass
        if "metadata" not in resp:  # legacy shape for unversioned tables
            resp["metadata"] = entry
        return resp

    def do_HEAD(self):  # noqa: N802 — spec existence checks
        p = self._parts()
        m = self.store.load()
        if len(p) == 5 and p[:2] == ["v1", "namespaces"] and p[3] == "tables":
            ok = f"{p[2]}.{p[4]}" in m["tables"]
        elif len(p) == 3 and p[:2] == ["v1", "namespaces"]:
            ok = p[2] in self._namespaces(m)
        else:
            ok = False
        self.send_response(204 if ok else 404)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_POST(self):  # noqa: N802
        p = self._parts()
        length = int(self.headers.get("Content-Length", "0"))
        try:
            req = json.loads(self.rfile.read(length) or b"{}")
        except json.JSONDecodeError:
            self._send(400, {"error": "invalid JSON"})
            return
        if p == ["v1", "namespaces"]:
            ns = req.get("namespace", [])
            if not ns:
                self._send(400, {"error": "missing namespace"})
                return
            db = ns[0]

            def _add(man: dict) -> None:
                if db not in man["databases"]:
                    man["databases"].append(db)

            self.store.mutate(_add)
            self._send(200, {"namespace": [db]})
        elif len(p) == 4 and p[:2] == ["v1", "namespaces"] and p[3] == "tables":
            db, tbl = p[2], req.get("name")
            meta = req.get("metadata")
            if not tbl or meta is None:
                self._send(400, {"error": "need name and metadata"})
                return
            self.store.mutate(
                lambda man: man["tables"].__setitem__(f"{db}.{tbl}", meta)
            )
            self._send(200, {"metadata": meta})
        else:
            self._send(404, {"error": "not found"})

    def do_DELETE(self):  # noqa: N802
        p = self._parts()
        if len(p) == 3 and p[:2] == ["v1", "namespaces"]:
            db = p[2]

            def _drop(man: dict) -> None:
                if db in man["databases"]:
                    man["databases"].remove(db)
                man["tables"] = {
                    k: v
                    for k, v in man["tables"].items()
                    if not k.startswith(db + ".")
                }

            self.store.mutate(_drop)
            self._send(200, {})
        elif len(p) == 5 and p[:2] == ["v1", "namespaces"] and p[3] == "tables":
            name = f"{p[2]}.{p[4]}"
            self.store.mutate(lambda man: man["tables"].pop(name, None))
            self._send(200, {})
        else:
            self._send(404, {"error": "not found"})


def serve_catalog(store, port: int = 0, host: str = "127.0.0.1"):
    """Start the REST catalog service over `store` on a daemon thread;
    returns (server, port). port=0 picks a free port."""
    handler = type("BoundCatalogHandler", (_CatalogHandler,), {"store": store})
    srv = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def make_store(
    catalog_type: str, uri: str | None, warehouse: str
):
    """Factory ≈ reference catalog/factory.go:23-36."""
    if catalog_type == "json":
        return JsonCatalogStore(
            uri or os.path.join(warehouse, "_ranger_catalog.json")
        )
    if catalog_type == "sqlite":
        return SqliteCatalogStore(
            uri or os.path.join(warehouse, "_ranger_catalog.db")
        )
    if catalog_type == "rest":
        if not uri:
            raise ValueError(
                "catalog URI is required for REST catalog "
                "(spark.ranger.catalog.uri)"
            )
        return RestCatalogStore(uri)
    raise ValueError(f"unsupported catalog type '{catalog_type}'")
