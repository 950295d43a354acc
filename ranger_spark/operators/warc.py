"""WARC (Web ARChive, ISO 28500) record parsing — the container format
of Common Crawl, the canonical LLM web-corpus source. The reference has
no WARC support; a 100 TB text pipeline starts by walking billions of
WARC records, so the engine carries a native parser alongside the other
byte-level decoders (operators/multimodal.py).

Format (public spec, ISO 28500 / WARC 1.0): each record is

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of payload>
    \r\n\r\n

records concatenated back-to-back (optionally gzip per record — gzip
members are detected and inflated). Parsing is an Arrow-batched
``mapInPandas`` byte-walk, the same shape as the image decoders: no
Python-row path, payload bytes never shuffle — only the extracted
fields leave the executor.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers build payloads)
from pyspark.sql import types as pst

_CRLF = b"\r\n"


def walk_warc_records(buf: bytes):
    """Yield ``(version, headers, payload)`` per record of one WARC
    file's bytes (headers lower-cased; payload raw bytes). Raises
    ValueError on malformed version lines / truncated payloads — a
    corrupt archive should fail loudly, not truncate silently. This is
    the single walker behind both the metadata operator
    (:func:`parse_warc_bytes`) and the first-class ``warc`` Python data
    source (sources/warc_datasource.py)."""
    import gzip

    if buf[:2] == b"\x1f\x8b":  # gzip'd archive (per-record members cat)
        buf = gzip.decompress(buf)
    pos, n, idx = 0, len(buf), 0
    while pos < n:
        # tolerate inter-record padding of extra CRLFs
        while buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = buf.find(_CRLF, pos)
        if eol < 0 or not buf[pos:eol].startswith(b"WARC/"):
            raise ValueError(
                f"record {idx}: expected WARC/ version line at byte {pos}"
            )
        version = buf[pos:eol].decode("utf-8", "replace")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = buf.find(_CRLF, pos)
            if eol < 0:
                raise ValueError(f"record {idx}: unterminated header block")
            line = buf[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line → payload follows
            k, _, v = line.partition(b":")
            # WARC 1.0 header fields are UTF-8 (ISO 28500)
            headers[k.strip().decode("utf-8", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"record {idx}: missing/bad Content-Length")
        if pos + clen > n:
            raise ValueError(
                f"record {idx}: payload truncated "
                f"({pos + clen - n} bytes short)"
            )
        payload = buf[pos : pos + clen]
        pos += clen
        yield version, headers, payload
        idx += 1


def parse_warc_bytes(buf: bytes) -> list[dict]:
    """Walk one WARC file's bytes; returns one dict per record with
    rec_index, rec_type, content_length, payload_md5, header_count."""
    out: list[dict] = []
    for idx, (version, headers, payload) in enumerate(walk_warc_records(buf)):
        out.append(
            {
                "rec_index": idx,
                "version": version,
                "rec_type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "content_length": len(payload),
                "payload_md5": hashlib.md5(payload).hexdigest(),
                "header_count": len(headers),
            }
        )
    return out


_OUT_SCHEMA = pst.StructType(
    [
        pst.StructField("doc_id", pst.LongType()),
        pst.StructField("rec_index", pst.IntegerType()),
        pst.StructField("rec_type", pst.StringType()),
        pst.StructField("content_length", pst.LongType()),
        pst.StructField("payload_md5", pst.StringType()),
        pst.StructField("header_count", pst.IntegerType()),
    ]
)


def parse_warc_records(
    df: DataFrame, id_col: str = "doc_id", warc_col: str = "warc"
) -> DataFrame:
    """(id, warc-bytes) → one row per WARC record. Arrow-batched; at
    100 TB each executor walks its archives locally and only the tiny
    extracted-field rows move."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[warc_col]):
                for r in parse_warc_bytes(bytes(buf)):
                    rows.append(
                        (
                            int(rid),
                            r["rec_index"],
                            r["rec_type"],
                            r["content_length"],
                            r["payload_md5"],
                            r["header_count"],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _OUT_SCHEMA.fields]
            )

    return df.select(id_col, warc_col).mapInPandas(run, _OUT_SCHEMA)
