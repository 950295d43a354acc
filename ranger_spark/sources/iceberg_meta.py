"""Iceberg v2 spec-shaped metadata emission over the engine's snapshot
layer (reference server/storage/storage.go:748-787 builds exactly this
format-version-2 metadata map per table; server/metadata/iceberg/
metadata.go:91-155 writes per-commit manifests — as JSON placeholders for
Avro, which is also what this module ships, matching the reference's own
fidelity level).

Every snapshot commit of a :class:`VersionedTable` gets:

- ``vN.metadata.json``     full spec v2 table metadata: format-version,
  table-uuid, location, schemas with field-ids, partition-specs
  (identity transforms), sort-orders, the complete snapshot list with
  summaries, snapshot-log and metadata-log;
- ``manifest-N.json``      one manifest of the files ADDED by commit N
  (status=1 entries with record-count / file-size from the parquet
  footers);
- ``snap-N.manifest-list.json``  the manifest-list of snapshot N:
  parent's manifests + the new one for fast-appends, just the new one
  for copy-on-write rewrites;
- ``version-hint.text``    current-version pointer (the HadoopCatalog
  convention), so external Iceberg-aware tooling can find the latest
  metadata file.

The engine's own JSON manifests under ``_ranger_meta`` remain the
commit-protocol source of truth; this directory is a faithful spec
projection of them (re-derivable at any time), which is what makes the
tables externally readable in an environment that does have the Iceberg
runtime jars.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from ranger_spark.sources import avro_ocf
from ranger_spark.sources.snapshots import VersionedTable

# engine operation → Iceberg snapshot summary operation
_ICEBERG_OPS = {
    "create": "append",
    "append": "append",
    "update": "overwrite",
    "merge": "overwrite",
    "alter": "replace",
    "optimize": "replace",  # rewrite_data_files: same rows, fewer files
    "delete": "delete",
}

# engine/Iceberg-DDL type name → Iceberg spec primitive
_ICE_TYPES = {
    "boolean": "boolean",
    "bool": "boolean",
    "int32": "int",
    "int64": "long",
    "float32": "float",
    "float64": "double",
    "string": "string",
    "date": "date",
    "time": "time",
    "timestamp": "timestamp",
    "timestamptz": "timestamptz",
    "uuid": "uuid",
    "binary": "binary",
}


def _ice_type(t: str) -> str:
    base = t.strip().lower()
    if base.startswith("decimal"):
        return base  # decimal(p,s) is spelled identically in the spec
    return _ICE_TYPES.get(base, "string")


def meta_dir(vt: VersionedTable) -> str:
    return os.path.join(vt.meta_dir, "iceberg")


def _file_stats(path: str) -> tuple[int, int]:
    """(record_count, file_size) from the parquet footer — the same two
    numbers the reference records per TableFile (metadata.go:113-117)."""
    size = os.path.getsize(path)
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows, size
    except Exception:
        return 0, size


def _manifest_entries(files: list[str], snapshot_id: int) -> list[dict]:
    entries = []
    for f in files:
        rows, size = _file_stats(f)
        entries.append(
            {
                "status": 1,  # added
                "snapshot-id": snapshot_id,
                "data-file": {
                    "content": 0,  # data (not deletes)
                    "file-path": f,
                    "file-format": "PARQUET",
                    "partition": {},
                    "record-count": rows,
                    "file-size-in-bytes": size,
                },
            }
        )
    return entries


def emit(
    vt: VersionedTable,
    columns: list[tuple[str, str, bool]],
    partition_by: list[str] | None = None,
    table_uuid: str | None = None,
) -> str:
    """Project the table's CURRENT snapshot history into spec-v2 metadata.
    Idempotent and self-healing: manifests/manifest-lists for earlier
    versions are written only if missing, the metadata.json is rebuilt
    from the engine manifests (the commit-protocol truth). Returns the
    metadata.json path."""
    d = meta_dir(vt)
    os.makedirs(d, exist_ok=True)

    # stable table-uuid: persisted next to the metadata on first emit
    uuid_path = os.path.join(d, "table-uuid")
    if table_uuid is None:
        if os.path.exists(uuid_path):
            table_uuid = open(uuid_path).read().strip()
        else:
            table_uuid = str(uuid.uuid4())
            with open(uuid_path, "w") as f:
                f.write(table_uuid)

    current = vt.current_version()
    fields = [
        {
            "id": i + 1,
            "name": name,
            "required": not nullable,
            "type": _ice_type(typ),
        }
        for i, (name, typ, nullable) in enumerate(columns)
    ]
    field_ids = {f["name"]: f["id"] for f in fields}
    spec_fields = [
        {
            "name": p,
            "transform": "identity",
            "source-id": field_ids.get(p, 0),
            "field-id": 1000 + i,
        }
        for i, p in enumerate(partition_by or [])
    ]

    snapshots: list[dict] = []
    snapshot_log: list[dict] = []
    prev_manifests: list[str] = []
    total_records = 0
    total_files = 0
    for v in range(1, current + 1):
        try:
            m = vt._load(v)
        except FileNotFoundError:
            continue  # expired snapshot — drops out of the projection
        added = m.get("added_files", [])
        op = _ICEBERG_OPS.get(m.get("operation", "append"), "append")

        # First retained snapshot after expiration: its expired ancestors'
        # manifests no longer appear in the chain, but their data files are
        # still live (listed in this manifest's full `files`). Emit a
        # consolidated base manifest from the full file list so external
        # Iceberg readers of this and later snapshots see every live file,
        # and seed the running totals from it. When nothing was expired,
        # files == added for v=1 and this is the ordinary first manifest.
        entry_files = added
        is_base = not snapshots and m.get("operation", "append") == "append"
        carried: list[str] = []
        if is_base:
            full = m.get("files", added)
            if set(full) != set(added):
                entry_files = full
                carried = [f for f in full if f not in set(added)]

        manifest_path = os.path.join(
            d, f"manifest-{v}-base.json" if carried else f"manifest-{v}.json"
        )
        if not os.path.exists(manifest_path):
            _write_json(
                manifest_path,
                {
                    "manifest-type": "ENTRY",
                    "content": 0,
                    "sequence-number": v,
                    "min-sequence-number": v,
                    "entries": _manifest_entries(entry_files, v),
                },
            )
        # REAL Avro twin of the manifest (the spec's actual file format —
        # the reference only ever writes the JSON placeholder,
        # metadata.go:99,130-146); external Iceberg readers walk these
        avro_manifest = manifest_path[: -len(".json")] + ".avro"
        if not os.path.exists(avro_manifest):
            with open(manifest_path) as mf:
                m_entries = json.load(mf)["entries"]
            avro_ocf.write_ocf(
                avro_manifest,
                avro_ocf.MANIFEST_ENTRY_SCHEMA,
                [
                    {
                        "status": e["status"],
                        "snapshot_id": e["snapshot-id"],
                        "sequence_number": e["snapshot-id"],
                        "file_sequence_number": e["snapshot-id"],
                        "data_file": {
                            "content": e["data-file"]["content"],
                            "file_path": e["data-file"]["file-path"],
                            "file_format": e["data-file"]["file-format"],
                            "partition": {},
                            "record_count": e["data-file"]["record-count"],
                            "file_size_in_bytes": e["data-file"][
                                "file-size-in-bytes"
                            ],
                        },
                    }
                    for e in m_entries
                ],
            )

        if m.get("operation") in ("append",) and prev_manifests:
            manifests = prev_manifests + [manifest_path]
        else:
            manifests = [manifest_path]
        prev_manifests = manifests

        list_path = os.path.join(d, f"snap-{v}.manifest-list.json")
        if not os.path.exists(list_path):
            _write_json(
                list_path,
                [
                    {
                        "manifest-path": p,
                        "partition-spec-id": 0,
                        "added-snapshot-id": v,
                    }
                    for p in manifests
                ],
            )
        # Avro twin of the manifest-list (the spec's real format; entries
        # point at the .avro manifests so an external reader can walk the
        # whole chain); metadata.json references this path
        avro_list = list_path[: -len(".json")] + ".avro"
        if not os.path.exists(avro_list):
            avro_ocf.write_ocf(
                avro_list,
                avro_ocf.MANIFEST_FILE_SCHEMA,
                [_manifest_file_record(p) for p in manifests],
            )

        added_records = sum(_cached_rows(d, v, added))
        if carried:
            # live files inherited from expired ancestors count toward the
            # totals, not toward this snapshot's added-* summary keys
            # (footer reads, not _cached_rows: manifest-{v}.json caches the
            # added files' counts, not the carried ones)
            total_records += sum(_file_stats(f)[0] for f in carried)
            total_files += len(carried)
        if op == "append":
            total_records += added_records
            total_files = total_files + len(added)
        else:
            total_records = added_records
            total_files = len(m.get("files", added))
        ts_ms = int(m["committed_at"] * 1000)
        snapshots.append(
            {
                "snapshot-id": v,
                "parent-snapshot-id": m.get("parent"),
                "sequence-number": v,
                "timestamp-ms": ts_ms,
                # spec-true pointer: the Avro manifest-list (the JSON twin
                # with the same basename is kept for debuggability and the
                # engine's own tooling)
                "manifest-list": list_path[: -len(".json")] + ".avro",
                "schema-id": 0,
                "summary": {
                    "operation": op,
                    "added-data-files": str(len(added)),
                    "added-records": str(added_records),
                    "total-data-files": str(total_files),
                    "total-records": str(total_records),
                    # engine-specific summary keys (Iceberg permits extra
                    # entries; its own engines add theirs the same way):
                    # the engine's operation name and the full-precision
                    # commit time (timestamp-ms truncates sub-ms)
                    "ranger-operation": m.get("operation", "append"),
                    "ranger-committed-at": repr(m["committed_at"]),
                },
            }
        )
        snapshot_log.append({"timestamp-ms": ts_ms, "snapshot-id": v})

    metadata = {
        "format-version": 2,
        "table-uuid": table_uuid,
        "location": vt.root,
        "last-sequence-number": current,
        "last-updated-ms": int(time.time() * 1000),
        "last-column-id": len(fields),
        "schemas": [{"schema-id": 0, "type": "struct", "fields": fields}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "last-partition-id": 999 + len(spec_fields),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {"engine-name": "ranger-spark", "engine-version": "0.4.0"},
        "current-snapshot-id": current if current else None,
        "snapshots": snapshots,
        "snapshot-log": snapshot_log,
        "metadata-log": [
            {
                "timestamp-ms": s["timestamp-ms"],
                "metadata-file": os.path.join(d, f"v{s['snapshot-id']}.metadata.json"),
            }
            for s in snapshots[:-1]
        ],
        "refs": {
            "main": {"snapshot-id": current, "type": "branch"}
        } if current else {},
    }
    path = os.path.join(d, f"v{current}.metadata.json")
    _write_json(path, metadata)
    with open(os.path.join(d, "version-hint.text"), "w") as f:
        f.write(str(current))
    return path


def _manifest_file_record(manifest_json_path: str) -> dict:
    """One manifest_file record (Iceberg spec v2) for the manifest-list,
    derived from the JSON manifest's own stats. The length recorded is
    the AVRO twin's size — that's the file the list points to."""
    with open(manifest_json_path) as f:
        m = json.load(f)
    seq = m.get("sequence-number", 0)
    entries = m.get("entries", [])
    rows = sum(e["data-file"]["record-count"] for e in entries)
    avro_path = manifest_json_path[: -len(".json")] + ".avro"
    return {
        "manifest_path": avro_path,
        "manifest_length": (
            os.path.getsize(avro_path) if os.path.exists(avro_path) else 0
        ),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": m.get("min-sequence-number", seq),
        "added_snapshot_id": seq,
        "added_files_count": len(entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }


def _cached_rows(d: str, version: int, added: list[str]) -> list[int]:
    """Record counts for a commit's added files, read back from its
    immutable manifest when present (avoids re-reading parquet footers on
    every emit)."""
    manifest_path = os.path.join(d, f"manifest-{version}.json")
    try:
        with open(manifest_path) as f:
            entries = json.load(f)["entries"]
        return [e["data-file"]["record-count"] for e in entries]
    except Exception:
        return [_file_stats(f)[0] for f in added]


def read_metadata(vt: VersionedTable) -> dict | None:
    """Load the current spec metadata (via version-hint), if emitted."""
    d = meta_dir(vt)
    hint = os.path.join(d, "version-hint.text")
    try:
        v = int(open(hint).read().strip())
        with open(os.path.join(d, f"v{v}.metadata.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_json(path: str, obj) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)
