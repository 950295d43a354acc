"""Postgres wire protocol (simple-query subset) over the Engine — the
reference's "JDBC" surface (reference server/protocols/jdbc/protocol.go:
startup/auth handshake :242-300, simple query → RowDescription + DataRow
:160-233). Implements exactly what the reference does: trust auth,
text-format results, one engine behind every connection.

Supported: StartupMessage (v3) → AuthenticationOk + ParameterStatus +
ReadyForQuery; 'Q' simple query → RowDescription/DataRow*/CommandComplete/
ReadyForQuery (errors → ErrorResponse); 'X' terminate; SSLRequest politely
refused ('N'). Extended protocol (parse/bind) is not implemented — the
reference's simple-query path is the parity target.
"""

from __future__ import annotations

import socket
import struct
import threading

from ranger_spark.engine import Engine

TEXT_OID = 25  # everything ships as text, like the reference
MAX_FRAME = 64 * 1024 * 1024  # cap client-declared frame length (64 MiB)


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack("!I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _row_description(columns: list[str]) -> bytes:
    body = struct.pack("!H", len(columns))
    for c in columns:
        body += _cstr(c) + struct.pack("!IHIhih", 0, 0, TEXT_OID, -1, -1, 0)
    return _msg(b"T", body)


def _data_row(row: tuple) -> bytes:
    body = struct.pack("!H", len(row))
    for v in row:
        if v is None:
            body += struct.pack("!i", -1)
        else:
            b = str(v).encode()
            body += struct.pack("!i", len(b)) + b
    return _msg(b"D", body)


def _error(message: str, code: str = "42000") -> bytes:
    body = b"S" + _cstr("ERROR") + b"C" + _cstr(code) + b"M" + _cstr(message) + b"\x00"
    return _msg(b"E", body)


READY = _msg(b"Z", b"I")


class PgWireServer:
    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind((host, port))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)

    def start(self) -> "PgWireServer":
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._stop.set()
        try:
            self.sock.close()
        except OSError:
            pass

    # ------------------------------------------------------------ internals
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _recv_exact(self, conn: socket.socket, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def _handle(self, conn: socket.socket) -> None:
        try:
            # startup phase (possibly preceded by an SSLRequest)
            while True:
                head = self._recv_exact(conn, 4)
                if head is None:
                    return
                (length,) = struct.unpack("!I", head)
                if not 4 <= length <= MAX_FRAME:
                    conn.sendall(_error(f"bad frame length {length}"))
                    return
                payload = self._recv_exact(conn, length - 4)
                if payload is None:
                    return
                (code,) = struct.unpack("!I", payload[:4])
                if code == 80877103:  # SSLRequest → not supported
                    conn.sendall(b"N")
                    continue
                if code == 196608:  # protocol 3.0 StartupMessage
                    break
                conn.sendall(_error(f"unsupported startup code {code}"))
                return
            conn.sendall(_msg(b"R", struct.pack("!I", 0)))  # AuthenticationOk
            conn.sendall(
                _msg(b"S", _cstr("server_version") + _cstr("ranger_spark"))
            )
            conn.sendall(READY)

            while not self._stop.is_set():
                tag = self._recv_exact(conn, 1)
                if tag is None or tag == b"X":
                    return
                head = self._recv_exact(conn, 4)
                if head is None:
                    return
                (length,) = struct.unpack("!I", head)
                # the declared length is client-controlled: reject before
                # allocating, and bail on a mid-message disconnect (payload
                # None) instead of letting .rstrip raise AttributeError
                if not 4 <= length <= MAX_FRAME:
                    conn.sendall(_error(f"bad frame length {length}"))
                    return
                payload = self._recv_exact(conn, length - 4)
                if payload is None:
                    return
                if tag != b"Q":
                    conn.sendall(_error(f"unsupported message {tag!r}"))
                    conn.sendall(READY)
                    continue
                sql = payload.rstrip(b"\x00").decode()
                self._run_query(conn, sql)
                conn.sendall(READY)
        except OSError:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _run_query(self, conn: socket.socket, sql: str) -> None:
        try:
            if not sql.rstrip().endswith(";"):
                sql = sql.rstrip() + ";"  # pg clients often omit it
            r = self.engine.execute(sql)
        except Exception as e:
            conn.sendall(_error(str(e)[:400]))
            return
        if r.columns:
            conn.sendall(_row_description(r.columns))
            for row in r.rows:
                conn.sendall(_data_row(row))
            conn.sendall(_msg(b"C", _cstr(f"SELECT {r.row_count}")))
        else:
            conn.sendall(_msg(b"C", _cstr(r.message or "OK")))


def serve(engine: Engine, port: int = 0) -> PgWireServer:
    return PgWireServer(engine, port=port).start()
