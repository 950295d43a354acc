"""Gateway: lifecycle manager for all protocol servers over one Engine —
the reference's ``server/gateway/gateway.go`` (NewGateway wires HTTP +
JDBC + native servers around the shared query engine :39-73; start
tolerates partial failure but refuses to run with zero servers
:75-139; shutdown stops everything and is idempotent :142-180) plus the
loader's component shape (``server/loader/loader.go``: ordered init,
reverse-order shutdown).

Default ports mirror ``server/config/constants.go``: HTTP 2847,
JDBC/pgwire 2848, native 2849 (tests pass 0 for ephemeral ports).
"""

from __future__ import annotations

import threading

from ranger_spark.engine import Engine
from ranger_spark.errors import RangerError

# server/config/constants.go:7-26
HTTP_SERVER_PORT = 2847
JDBC_SERVER_PORT = 2848
NATIVE_SERVER_PORT = 2849

GATEWAY_ALREADY_STARTED = "gateway.already_started"
GATEWAY_ALL_SERVERS_FAILED = "gateway.all_servers_failed_to_start"


class _HttpHandle:
    """Uniform .port/.shutdown over the stdlib ThreadingHTTPServer the
    http_server module returns."""

    def __init__(self, srv, port: int):
        self._srv = srv
        self.port = port

    def shutdown(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()


class Gateway:
    """Starts/stops the HTTP, pgwire (the reference's "JDBC") and native
    protocol servers over a shared Engine. Per-server enable flags and
    ports follow the reference config surface; a server that fails to
    start is logged and skipped — the gateway is operational as long as
    at least one started (gateway.go:124-130)."""

    def __init__(
        self,
        engine: Engine,
        host: str = "127.0.0.1",
        http_port: int | None = HTTP_SERVER_PORT,
        jdbc_port: int | None = JDBC_SERVER_PORT,
        native_port: int | None = NATIVE_SERVER_PORT,
        native_kwargs: dict | None = None,
        astha: bool = True,
    ):
        """A ``None`` port disables that server (config.go
        IsXServerEnabled); 0 binds an ephemeral port (tests).
        ``native_kwargs`` forwards auth-middleware / circuit-breaker
        options to the native server (require_auth, users,
        max_concurrent_queries, max_query_duration_s) — the gateway's
        analog of the reference's middleware wiring (server.go:46-70)."""
        self.engine = engine
        self.host = host
        self.native_kwargs = dict(native_kwargs or {})
        self._want = {
            "http": http_port,
            "jdbc": jdbc_port,
            "native": native_port,
        }
        self.servers: dict[str, object] = {}
        self.errors: dict[str, str] = {}
        self._started = False
        self._mu = threading.Lock()
        # Astha CDC loop + schema-cache subscriber: commits from ANY
        # writer sharing the warehouse (another protocol server, another
        # engine, a storage-level ingest) invalidate this engine's
        # cached table registrations event-driven — the reference wires
        # its schema cache the same way (astha_subscriber.go) instead of
        # trusting every write site to refresh ad hoc.
        self._want_astha = astha
        self.astha = None

    # ------------------------------------------------------------ lifecycle
    def start(self) -> "Gateway":
        with self._mu:
            if self._started:
                raise RangerError(
                    GATEWAY_ALREADY_STARTED, "gateway is already started"
                )
            total = 0
            for name, port in self._want.items():
                if port is None:
                    continue
                total += 1
                try:
                    self.servers[name] = self._start_one(name, port)
                except Exception as e:  # continue with other servers
                    self.errors[name] = str(e)
            if total and not self.servers:
                raise RangerError(
                    GATEWAY_ALL_SERVERS_FAILED,
                    "all servers failed to start",
                    errors=dict(self.errors),
                )
            if self._want_astha:
                try:
                    from ranger_spark.streaming.astha import (
                        Astha,
                        register_schema_cache,
                    )

                    self.astha = Astha(self.engine).start()
                    register_schema_cache(self.astha, self.engine)
                except Exception as e:  # servers still serve without CDC
                    self.errors["astha"] = str(e)
            self._started = True
            return self

    def _start_one(self, name: str, port: int):
        if name == "http":
            from ranger_spark.sources.http_server import serve

            srv, bound = serve(self.engine, port=port, host=self.host)
            return _HttpHandle(srv, bound)
        if name == "jdbc":
            from ranger_spark.sources.pgwire_server import PgWireServer

            return PgWireServer(self.engine, host=self.host, port=port).start()
        from ranger_spark.sources.native_server import NativeServer

        return NativeServer(
            self.engine, host=self.host, port=port, **self.native_kwargs
        ).start()

    def shutdown(self) -> None:
        """Idempotent; stops every running server (gateway.go:142-180)."""
        with self._mu:
            if not self._started:
                return
            if self.astha is not None:
                try:
                    self.astha.stop()
                except Exception:
                    pass
                self.astha = None
            for srv in self.servers.values():
                try:
                    srv.shutdown()
                except Exception:
                    pass
            self.servers.clear()
            self._started = False

    # ------------------------------------------------------------ health
    def ports(self) -> dict[str, int]:
        """Actual bound ports of the running servers."""
        return {n: s.port for n, s in self.servers.items()}

    def health(self) -> dict:
        """Health snapshot — the reference dedicates a health-check port
        (constants.go HEALTH_CHECK_PORT); here the same payload is a
        method (and served by the HTTP server's /health route)."""
        return {
            "started": self._started,
            "servers": sorted(self.servers),
            "failed": dict(self.errors),
        }


class RangerServer:
    """The reference server binary's composition root
    (server/loader/loader.go registerComponents → catalog, storage,
    query engine, gateway): builds an Engine over an existing
    SparkSession, recovers the durable catalog, and runs the gateway.
    Shutdown is reverse-order (gateway first), like Loader.Shutdown."""

    def __init__(self, spark, **gateway_kwargs):
        self.engine = Engine(spark)
        self.recovered = self.engine.recover()
        self.gateway = Gateway(self.engine, **gateway_kwargs)

    def start(self) -> "RangerServer":
        self.gateway.start()
        return self

    def shutdown(self) -> None:
        self.gateway.shutdown()
