"""Minimal Avro Object Container File writer (stdlib only).

Iceberg manifests and manifest lists are Avro OCF per the public Iceberg
spec; the reference never actually writes them (its metadata layer emits
JSON placeholders — ``server/metadata/iceberg/metadata.go:99,130-146``).
We emit REAL Avro so external Iceberg readers can walk the snapshot
chain. A full Avro library isn't in this container and a Spark job per
tiny manifest would be absurd driver overhead, so this module implements
the (small) subset of Avro binary encoding the Iceberg manifest schemas
need: null/boolean/int/long/string/bytes, records, unions, arrays, maps.
Correctness is cross-checked in tests by decoding the output with the
spark-avro module (a real Avro implementation).

Format per the public Avro 1.12 spec: magic ``Obj\\x01``, file-metadata
map ({"avro.schema": ..., "avro.codec": "null"}), 16-byte sync marker,
then blocks of <record count, byte length, records, sync>.
"""

from __future__ import annotations

import json
import os
import struct


def _zigzag(n: int) -> bytes:
    """Avro int/long: zigzag then LEB128 varint."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def _string(s: str) -> bytes:
    return _bytes(s.encode("utf-8"))


def encode(value, schema) -> bytes:
    """Encode one value against an Avro schema (JSON-object form)."""
    if isinstance(schema, list):  # union: branch index + value
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return _zigzag(i)
            if value is not None and bt != "null":
                return _zigzag(i) + encode(value, branch)
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return _zigzag(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "string":
        return _string(str(value))
    if t == "bytes":
        return _bytes(bytes(value))
    if t == "record":
        out = bytearray()
        for f in schema["fields"]:
            out += encode(value.get(f["name"]), f["type"])
        return bytes(out)
    if t == "array":
        if not value:
            return _zigzag(0)
        out = bytearray(_zigzag(len(value)))
        for item in value:
            out += encode(item, schema["items"])
        return bytes(out) + _zigzag(0)
    if t == "map":
        if not value:
            return _zigzag(0)
        out = bytearray(_zigzag(len(value)))
        for k, v in value.items():
            out += _string(str(k)) + encode(v, schema["values"])
        return bytes(out) + _zigzag(0)
    raise ValueError(f"unsupported Avro type: {t!r}")


# fixed sync marker: deterministic output for idempotent re-emission
# (the spec only requires the 16 bytes to match between header and blocks)
_SYNC = b"ranger-spark-ocf"[:16]


def write_ocf(path: str, schema: dict, records: list[dict]) -> str:
    """Write records as a single-block, null-codec Avro OCF (atomic via
    temp + rename). Returns the path."""
    meta_schema = {"type": "map", "values": "bytes"}
    header = (
        b"Obj\x01"
        + encode(
            {
                "avro.schema": json.dumps(schema).encode(),
                "avro.codec": b"null",
            },
            meta_schema,
        )
        + _SYNC
    )
    body = b"".join(encode(r, schema) for r in records)
    block = (_zigzag(len(records)) + _zigzag(len(body)) + body + _SYNC) if records else b""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header + block)
    os.replace(tmp, path)
    return path


# --------------------------------------------------------------------------
# Iceberg spec schemas (v2, required fields; field-id props per the spec)
# --------------------------------------------------------------------------

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "field-id": 4},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        "type": {"type": "record", "name": "r102", "fields": []},
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                ],
            },
        },
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}
