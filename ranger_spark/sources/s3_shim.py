"""In-process S3-compatible object store (HTTP shim).

Stands in for the AWS S3 API so the engine's ``STORAGE s3`` path can be
exercised end-to-end in an offline sandbox — the same role the
reference's s3 test doubles play for server/storage/s3/fs.go (exercised
by s3/fs_test.go). Real S3 clients (boto3, pyarrow's AWS-SDK-backed
S3FileSystem) speak to it over localhost HTTP with path-style
addressing; authentication headers are accepted and ignored.

Implemented API subset (all the calls an object-store-backed warehouse
needs): PutObject (including aws-chunked streaming bodies with
checksum trailers, which modern boto3 emits by default), GetObject
(with Range), HeadObject, DeleteObject, DeleteObjects (batch POST
?delete), ListObjectsV2 (prefix/delimiter/max-keys/continuation-token),
CreateBucket/HeadBucket, and the multipart-upload lifecycle
(Create/UploadPart/Complete/Abort).

This is test/dev infrastructure, not a durable store: objects live in
memory under a lock. At cluster scale the engine rides real S3 through
the standard fs.s3a.* confs instead (see engine._storage_root).
"""

from __future__ import annotations

import hashlib
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlsplit
from xml.etree import ElementTree
from xml.sax.saxutils import escape

_XMLNS = "http://s3.amazonaws.com/doc/2006-03-01/"
_LAST_MODIFIED = "2026-01-01T00:00:00.000Z"  # fixed: determinism over realism


def _decode_aws_chunked(body: bytes) -> bytes:
    """Decode aws-chunked transfer framing: `<hexsize>[;ext]\\r\\n<data>\\r\\n`
    repeated, a `0[;ext]\\r\\n` terminator, then optional checksum trailers.
    Used when x-amz-content-sha256 is a STREAMING-* sentinel."""
    out = bytearray()
    i = 0
    n = len(body)
    while i < n:
        j = body.index(b"\r\n", i)
        size_field = body[i:j].split(b";", 1)[0]
        size = int(size_field, 16)
        if size == 0:
            break  # trailers (if any) follow; payload is complete
        start = j + 2
        out += body[start : start + size]
        i = start + size + 2  # skip data + trailing CRLF
    return bytes(out)


class _BadRequest(Exception):
    """Client-side framing error → 400 XML error response."""


class _Store:
    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.buckets: dict[str, dict[str, bytes]] = {}
        # (bucket, key, upload_id) -> {part_number: bytes}
        self.uploads: dict[tuple[str, str, str], dict[int, bytes]] = {}


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    store: _Store  # set by serve()

    def log_message(self, *args) -> None:  # silence request logging
        pass

    # ------------------------------------------------------------ helpers
    def _path_parts(self) -> tuple[str, str, dict]:
        u = urlsplit(self.path)
        parts = u.path.lstrip("/").split("/", 1)
        bucket = unquote(parts[0])
        key = unquote(parts[1]) if len(parts) > 1 else ""
        q = parse_qs(u.query, keep_blank_values=True)
        return bucket, key, q

    def _read_body(self) -> bytes:
        length = int(self.headers.get("Content-Length", 0) or 0)
        body = self.rfile.read(length) if length else b""
        sha = self.headers.get("x-amz-content-sha256", "")
        if sha.startswith("STREAMING-") or "aws-chunked" in (
            self.headers.get("Content-Encoding", "") or ""
        ):
            try:
                body = _decode_aws_chunked(body)
            except (ValueError, IndexError) as e:
                # malformed chunk framing → typed 400, not a handler
                # traceback + dropped connection
                raise _BadRequest(f"malformed aws-chunked body: {e}") from e
        return body

    def _send(
        self,
        code: int,
        body: bytes = b"",
        ctype: str = "application/xml",
        extra: dict | None = None,
    ) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        if "Content-Length" not in (extra or {}):
            self.send_header("Content-Length", str(len(body)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if body and self.command != "HEAD":
            self.wfile.write(body)

    def _error(self, code: int, s3_code: str, message: str) -> None:
        body = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            f"<Error><Code>{s3_code}</Code><Message>{escape(message)}</Message>"
            "</Error>"
        ).encode()
        self._send(code, body)

    def _etag(self, data: bytes) -> str:
        return '"' + hashlib.md5(data).hexdigest() + '"'

    def _range_unsatisfiable(self, total: int) -> None:
        body = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            "<Error><Code>InvalidRange</Code>"
            "<Message>The requested range is not satisfiable</Message>"
            "</Error>"
        ).encode()
        self._send(416, body, extra={"Content-Range": f"bytes */{total}"})

    # ------------------------------------------------------------- verbs
    def do_PUT(self) -> None:
        bucket, key, q = self._path_parts()
        st = self.store
        if not key:  # CreateBucket
            with st.lock:
                st.buckets.setdefault(bucket, {})
            self._send(200)
            return
        try:
            body = self._read_body()
        except _BadRequest as e:
            self._error(400, "IncompleteBody", str(e))
            return
        if "partNumber" in q and "uploadId" in q:  # UploadPart
            upload_id = q["uploadId"][0]
            part = int(q["partNumber"][0])
            with st.lock:
                parts = st.uploads.get((bucket, key, upload_id))
                if parts is None:
                    self._error(404, "NoSuchUpload", upload_id)
                    return
                parts[part] = body
            self._send(200, extra={"ETag": self._etag(body)})
            return
        with st.lock:
            st.buckets.setdefault(bucket, {})[key] = body
        self._send(200, extra={"ETag": self._etag(body)})

    def do_GET(self) -> None:
        bucket, key, q = self._path_parts()
        st = self.store
        with st.lock:
            objs = st.buckets.get(bucket)
            if objs is None:
                self._error(404, "NoSuchBucket", bucket)
                return
            if not key:
                self._list_objects_v2(bucket, dict(objs), q)
                return
            data = objs.get(key)
        if data is None:
            self._error(404, "NoSuchKey", key)
            return
        rng = self.headers.get("Range")
        if rng:
            m = re.fullmatch(r"bytes=(\d*)-(\d*)", rng.strip())
            if m:
                lo = int(m.group(1)) if m.group(1) else None
                hi = int(m.group(2)) if m.group(2) else None
                total = len(data)
                if lo is None:  # suffix range: last N bytes
                    if not hi:  # bytes=-0 is unsatisfiable per RFC 7233
                        self._range_unsatisfiable(total)
                        return
                    lo = max(0, total - hi)
                    hi = total - 1
                else:
                    if lo >= total:  # start beyond EOF → 416, like real S3
                        self._range_unsatisfiable(total)
                        return
                    hi = min(hi, total - 1) if hi is not None else total - 1
                chunk = data[lo : hi + 1]
                self._send(
                    206,
                    chunk,
                    ctype="application/octet-stream",
                    extra={
                        "Content-Range": f"bytes {lo}-{hi}/{total}",
                        "ETag": self._etag(data),
                        "Accept-Ranges": "bytes",
                        "Last-Modified": "Thu, 01 Jan 2026 00:00:00 GMT",
                    },
                )
                return
        self._send(
            200,
            data,
            ctype="application/octet-stream",
            extra={
                "ETag": self._etag(data),
                "Accept-Ranges": "bytes",
                "Last-Modified": "Thu, 01 Jan 2026 00:00:00 GMT",
            },
        )

    def do_HEAD(self) -> None:
        bucket, key, _ = self._path_parts()
        with self.store.lock:
            objs = self.store.buckets.get(bucket)
            if objs is None:
                self._send(404)
                return
            if not key:  # HeadBucket
                self._send(200)
                return
            data = objs.get(key)
        if data is None:
            self._send(404)
            return
        self._send(
            200,
            b"",
            ctype="application/octet-stream",
            extra={
                "Content-Length": str(len(data)),
                "ETag": self._etag(data),
                "Accept-Ranges": "bytes",
                "Last-Modified": "Thu, 01 Jan 2026 00:00:00 GMT",
            },
        )

    def do_DELETE(self) -> None:
        bucket, key, q = self._path_parts()
        st = self.store
        with st.lock:
            if "uploadId" in q:  # AbortMultipartUpload
                st.uploads.pop((bucket, key, q["uploadId"][0]), None)
                self._send(204)
                return
            objs = st.buckets.get(bucket)
            if objs is not None:
                if key:
                    objs.pop(key, None)
                else:
                    st.buckets.pop(bucket, None)
        self._send(204)

    def do_POST(self) -> None:
        bucket, key, q = self._path_parts()
        st = self.store
        if "uploads" in q:  # CreateMultipartUpload
            upload_id = uuid.uuid4().hex
            with st.lock:
                st.buckets.setdefault(bucket, {})
                st.uploads[(bucket, key, upload_id)] = {}
            body = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                f'<InitiateMultipartUploadResult xmlns="{_XMLNS}">'
                f"<Bucket>{escape(bucket)}</Bucket><Key>{escape(key)}</Key>"
                f"<UploadId>{upload_id}</UploadId>"
                "</InitiateMultipartUploadResult>"
            ).encode()
            self._send(200, body)
            return
        if "uploadId" in q:  # CompleteMultipartUpload
            upload_id = q["uploadId"][0]
            try:
                self._read_body()  # part list XML; assembly uses stored parts
            except _BadRequest as e:
                self._error(400, "IncompleteBody", str(e))
                return
            with st.lock:
                parts = st.uploads.pop((bucket, key, upload_id), None)
                if parts is None:
                    self._error(404, "NoSuchUpload", upload_id)
                    return
                data = b"".join(parts[n] for n in sorted(parts))
                st.buckets.setdefault(bucket, {})[key] = data
            body = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                f'<CompleteMultipartUploadResult xmlns="{_XMLNS}">'
                f"<Bucket>{escape(bucket)}</Bucket><Key>{escape(key)}</Key>"
                f"<ETag>{self._etag(data)}</ETag>"
                "</CompleteMultipartUploadResult>"
            ).encode()
            self._send(200, body)
            return
        if "delete" in q:  # DeleteObjects (batch)
            try:
                body = self._read_body()
                root = ElementTree.fromstring(body)
            except (_BadRequest, ElementTree.ParseError) as e:
                self._error(400, "MalformedXML", str(e))
                return
            ns = ""
            if root.tag.startswith("{"):
                ns = root.tag[: root.tag.index("}") + 1]
            keys = [
                el.findtext(f"{ns}Key")
                for el in root.findall(f"{ns}Object")
            ]
            deleted = []
            with st.lock:
                objs = st.buckets.get(bucket, {})
                for k in keys:
                    if k is not None:
                        objs.pop(k, None)
                        deleted.append(k)
            out = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                f'<DeleteResult xmlns="{_XMLNS}">'
                + "".join(
                    f"<Deleted><Key>{escape(k)}</Key></Deleted>" for k in deleted
                )
                + "</DeleteResult>"
            ).encode()
            self._send(200, out)
            return
        self._error(400, "NotImplemented", f"POST {self.path}")

    # ----------------------------------------------------------- listing
    def _list_objects_v2(self, bucket: str, objs: dict, q: dict) -> None:
        prefix = q.get("prefix", [""])[0]
        delimiter = q.get("delimiter", [""])[0]
        max_keys = int(q.get("max-keys", ["1000"])[0])
        token = q.get("continuation-token", [""])[0]
        start_after = q.get("start-after", [""])[0]
        keys = sorted(k for k in objs if k.startswith(prefix))
        floor = token or start_after
        if floor:
            keys = [k for k in keys if k > floor]
        contents: list[str] = []
        common: list[str] = []
        emitted = 0
        truncated = False
        next_token = ""
        i = 0
        while i < len(keys):
            k = keys[i]
            if emitted >= max_keys:
                truncated = True
                break
            if delimiter:
                rest = k[len(prefix) :]
                d = rest.find(delimiter)
                if d >= 0:
                    cp = prefix + rest[: d + len(delimiter)]
                    common.append(cp)
                    emitted += 1
                    # advance past EVERY key under this prefix so the
                    # continuation token never lands inside it — a token
                    # mid-prefix would re-emit the same CommonPrefix on
                    # the next page (real S3 rolls the whole prefix up)
                    while i < len(keys) and keys[i].startswith(cp):
                        i += 1
                    next_token = keys[i - 1]
                    continue
            contents.append(k)
            emitted += 1
            next_token = k
            i += 1
        body_parts = [
            '<?xml version="1.0" encoding="UTF-8"?>',
            f'<ListBucketResult xmlns="{_XMLNS}">',
            f"<Name>{escape(bucket)}</Name>",
            f"<Prefix>{escape(prefix)}</Prefix>",
            f"<KeyCount>{emitted}</KeyCount>",
            f"<MaxKeys>{max_keys}</MaxKeys>",
            f"<IsTruncated>{'true' if truncated else 'false'}</IsTruncated>",
        ]
        if truncated:
            body_parts.append(
                f"<NextContinuationToken>{escape(next_token)}"
                "</NextContinuationToken>"
            )
        for k in contents:
            body_parts.append(
                "<Contents>"
                f"<Key>{escape(k)}</Key>"
                f"<LastModified>{_LAST_MODIFIED}</LastModified>"
                f"<ETag>{self._etag(objs[k])}</ETag>"
                f"<Size>{len(objs[k])}</Size>"
                "<StorageClass>STANDARD</StorageClass>"
                "</Contents>"
            )
        for cp in common:
            body_parts.append(
                f"<CommonPrefixes><Prefix>{escape(cp)}</Prefix></CommonPrefixes>"
            )
        body_parts.append("</ListBucketResult>")
        self._send(200, "".join(body_parts).encode())


class S3Shim:
    """Lifecycle wrapper: ``serve()`` → use ``endpoint`` → ``shutdown()``."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        store = _Store()
        handler = type("BoundHandler", (_Handler,), {"store": store})
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.store = store
        self.port = self.httpd.server_address[1]
        self.endpoint = f"http://{host}:{self.port}"
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )

    def start(self) -> "S3Shim":
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()

    # test introspection
    def keys(self, bucket: str) -> list[str]:
        with self.store.lock:
            return sorted(self.store.buckets.get(bucket, {}))


def serve(host: str = "127.0.0.1", port: int = 0) -> S3Shim:
    return S3Shim(host, port).start()
