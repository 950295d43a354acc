"""Iceberg v2 spec metadata projection (reference storage.go:748-787
metadata map, metadata.go:91-155 manifests): structural validation of
required spec fields, per-commit manifests with footer-true record
counts, and SHOW SNAPSHOTS served from the projection."""

from __future__ import annotations

import json
import os

import pytest

from ranger_spark.sources import iceberg_meta
from ranger_spark.sources.snapshots import VersionedTable

REQUIRED_V2_FIELDS = (
    "format-version", "table-uuid", "location", "last-sequence-number",
    "last-updated-ms", "last-column-id", "schemas", "current-schema-id",
    "partition-specs", "default-spec-id", "sort-orders",
    "default-sort-order-id", "snapshots", "current-snapshot-id",
    "snapshot-log", "metadata-log", "refs", "properties",
)


@pytest.fixture(scope="module", autouse=True)
def db(engine):
    engine.execute("CREATE DATABASE IF NOT EXISTS icm;")
    engine.execute("USE icm;")
    yield
    engine.spark.sql("DROP DATABASE IF EXISTS icm CASCADE")


@pytest.fixture()
def table(engine):
    engine.execute("DROP TABLE IF EXISTS it;")
    engine.execute("CREATE TABLE it (id int32, v string, amt float64);")
    engine.execute(
        "INSERT INTO it (id, v, amt) VALUES (1, 'a', 1.5), (2, 'b', 2.5);"
    )
    engine.execute("INSERT INTO it (id, v, amt) VALUES (3, 'c', 3.5);")
    engine.execute("UPDATE it SET v = 'B' WHERE id = 2;")
    return engine._qualify("it")


def _vt(engine, name) -> VersionedTable:
    return VersionedTable(engine._manifest["tables"][name]["location"])


def test_metadata_has_required_spec_fields(engine, table):
    meta = iceberg_meta.read_metadata(_vt(engine, table))
    assert meta is not None
    for f in REQUIRED_V2_FIELDS:
        assert f in meta, f"missing spec field {f}"
    assert meta["format-version"] == 2
    schema = meta["schemas"][meta["current-schema-id"]]
    assert [(f["name"], f["type"]) for f in schema["fields"]] == [
        ("id", "int"), ("v", "string"), ("amt", "double"),
    ]
    assert all("id" in f for f in schema["fields"])
    assert meta["last-column-id"] == 3
    assert meta["current-snapshot-id"] == 4  # create + 2 inserts + update
    assert meta["refs"]["main"]["snapshot-id"] == 4


def test_snapshot_chain_and_summaries(engine, table):
    meta = iceberg_meta.read_metadata(_vt(engine, table))
    snaps = meta["snapshots"]
    assert [s["snapshot-id"] for s in snaps] == [1, 2, 3, 4]
    assert [s["parent-snapshot-id"] for s in snaps] == [None, 1, 2, 3]
    ops = [s["summary"]["operation"] for s in snaps]
    assert ops == ["append", "append", "append", "overwrite"]
    # footer-true record counts: 2 added, then 1; the overwrite rewrites 3
    assert snaps[1]["summary"]["added-records"] == "2"
    assert snaps[2]["summary"]["added-records"] == "1"
    assert snaps[1]["summary"]["total-records"] == "2"
    assert snaps[2]["summary"]["total-records"] == "3"
    assert snaps[3]["summary"]["total-records"] == "3"
    # timestamps monotone non-decreasing
    ts = [s["timestamp-ms"] for s in snaps]
    assert ts == sorted(ts)


def test_manifests_and_lists_exist_with_real_files(engine, table):
    vt = _vt(engine, table)
    meta = iceberg_meta.read_metadata(vt)
    for s in meta["snapshots"]:
        mlist = json.load(open(s["manifest-list"].replace(".avro", ".json")))
        assert mlist, "empty manifest list"
        for entry in mlist:
            manifest = json.load(open(entry["manifest-path"]))
            for e in manifest["entries"]:
                df = e["data-file"]
                assert df["file-format"] == "PARQUET"
                if s["summary"]["ranger-operation"] != "create":
                    assert os.path.exists(df["file-path"])
                    assert df["file-size-in-bytes"] > 0
    # the append snapshot's manifest list carries the parent's manifests
    assert len(json.load(open(meta["snapshots"][2]["manifest-list"].replace(".avro", ".json")))) == 3
    # the copy-on-write rewrite starts a fresh manifest list
    assert len(json.load(open(meta["snapshots"][3]["manifest-list"].replace(".avro", ".json")))) == 1
    # version-hint points at the current metadata file
    d = iceberg_meta.meta_dir(vt)
    assert open(os.path.join(d, "version-hint.text")).read() == "4"


def test_table_uuid_stable_across_commits(engine, table):
    vt = _vt(engine, table)
    before = iceberg_meta.read_metadata(vt)["table-uuid"]
    engine.execute("INSERT INTO it (id, v, amt) VALUES (9, 'z', 0.5);")
    after = iceberg_meta.read_metadata(vt)["table-uuid"]
    assert before == after


def test_show_snapshots_served_from_projection(engine, table):
    vt = _vt(engine, table)
    meta = iceberg_meta.read_metadata(vt)
    r = engine.execute("SHOW SNAPSHOTS FROM it;")
    assert [row[0] for row in r.rows] == [
        s["snapshot-id"] for s in meta["snapshots"]
    ]
    # operations are the ENGINE names (carried in the summary), not the
    # coarser spec operations
    assert [row[2] for row in r.rows] == ["create", "append", "append", "update"]
    # full-precision commit times round-trip through the summary
    assert [row[1] for row in r.rows] == [
        float(s["summary"]["ranger-committed-at"]) for s in meta["snapshots"]
    ]


def test_partitioned_table_spec(engine):
    engine.execute("DROP TABLE IF EXISTS itp;")
    engine.execute(
        "CREATE TABLE itp (id int32, cat string) PARTITION BY (cat);"
    )
    engine.execute("INSERT INTO itp (id, cat) VALUES (1, 'x'), (2, 'y');")
    meta = iceberg_meta.read_metadata(_vt(engine, engine._qualify("itp")))
    spec = meta["partition-specs"][meta["default-spec-id"]]
    assert spec["fields"] == [
        {"name": "cat", "transform": "identity", "source-id": 2,
         "field-id": 1000}
    ]
    engine.execute("DROP TABLE itp;")


def test_metadata_survives_catalog_recovery(engine):
    # the spec projection lives next to the data, so a catalog wipe +
    # recover() leaves SHOW SNAPSHOTS (served from it) fully intact
    engine.execute("DROP TABLE IF EXISTS itr;")
    engine.execute("CREATE TABLE itr (id int32);")
    engine.execute("INSERT INTO itr (id) VALUES (1), (2);")
    name = engine._qualify("itr")
    before = engine.execute("SHOW SNAPSHOTS FROM itr;").rows
    meta_before = iceberg_meta.read_metadata(_vt(engine, name))
    engine.spark.sql("DROP TABLE itr")  # catalog loss, data intact
    assert engine.recover() >= 1
    after = engine.execute("SHOW SNAPSHOTS FROM itr;").rows
    assert after == before
    assert iceberg_meta.read_metadata(_vt(engine, name)) == meta_before
    assert engine.execute("SELECT count(*) AS n FROM itr;").rows == [(2,)]
    engine.execute("DROP TABLE itr;")


def test_expire_reseeds_base_manifest_with_live_files(engine):
    """After expire_snapshots, the first retained append's manifest chain
    must still cover every live data file (the expired ancestors'
    manifests are gone but their files live on in retained snapshots),
    and running totals must not restart from zero."""
    engine.execute("DROP TABLE IF EXISTS exp;")
    engine.execute("CREATE TABLE exp (id int32, v string);")
    for i in range(3):
        engine.execute(f"INSERT INTO exp (id, v) VALUES ({i}, 'x{i}');")
    engine.expire_snapshots("exp", keep_last=2)
    engine.execute("INSERT INTO exp (id, v) VALUES (99, 'tail');")

    name = engine._qualify("exp")
    vt = _vt(engine, name)
    meta = iceberg_meta.read_metadata(vt)
    cur = vt.current_version()
    assert meta["current-snapshot-id"] == cur
    # expired snapshot ids are absent from the projection
    assert [s["snapshot-id"] for s in meta["snapshots"]] == list(
        range(cur - 2, cur + 1)
    )
    head = meta["snapshots"][-1]
    # walk manifest-list → manifests → data files: all live files visible
    seen: set[str] = set()
    with open(head["manifest-list"].replace(".avro", ".json")) as f:
        mlist = json.load(f)
    for entry in mlist:
        with open(entry["manifest-path"]) as f:
            man = json.load(f)
        seen |= {e["data-file"]["file-path"] for e in man["entries"]}
    assert seen == set(vt.files())
    # totals seeded from the full retained file list, not just added
    assert int(head["summary"]["total-records"]) == 4
    assert int(head["summary"]["total-data-files"]) == len(vt.files())


def test_show_snapshots_falls_back_when_projection_stale(engine):
    """SHOW SNAPSHOTS serves the engine manifests (source of truth) when
    the best-effort Iceberg projection lags the current version."""
    engine.execute("DROP TABLE IF EXISTS st;")
    engine.execute("CREATE TABLE st (id int32);")
    engine.execute("INSERT INTO st (id) VALUES (1);")
    engine.execute("INSERT INTO st (id) VALUES (2);")
    name = engine._qualify("st")
    vt = _vt(engine, name)
    # simulate a failed emission: roll the projection hint back one version
    hint = os.path.join(iceberg_meta.meta_dir(vt), "version-hint.text")
    with open(hint, "w") as f:
        f.write(str(vt.current_version() - 1))
    r = engine.execute("SHOW SNAPSHOTS FROM st;")
    versions = [row[0] for row in r.rows]
    # current head present despite the stale projection (which stops one
    # version short); the projection alone would have omitted it
    assert versions[-1] == vt.current_version()
    assert versions == list(range(1, vt.current_version() + 1))


def test_avro_manifests_decode_and_match_commits(engine, spark, table):
    """The emitted manifests/manifest-lists are REAL Avro (the spec's
    format; the reference writes JSON placeholders, metadata.go:99):
    decode them back with spark-avro — an independent Avro
    implementation — walk the chain from metadata.json, and the file set
    must equal the committed snapshot's file list with footer-true
    record counts."""
    vt = _vt(engine, table)
    meta = iceberg_meta.read_metadata(vt)
    head = meta["snapshots"][-1]
    assert head["manifest-list"].endswith(".avro")
    fmt = "org.apache.spark.sql.avro.AvroFileFormat"
    mlist = spark.read.format(fmt).load(head["manifest-list"]).collect()
    assert mlist
    seen: dict[str, int] = {}
    for mf in mlist:
        assert mf.manifest_path.endswith(".avro")
        assert mf.manifest_length == os.path.getsize(mf.manifest_path)
        entries = spark.read.format(fmt).load(mf.manifest_path).collect()
        assert len(entries) == mf.added_files_count
        assert sum(e.data_file.record_count for e in entries) == mf.added_rows_count
        for e in entries:
            assert e.status == 1 and e.data_file.file_format == "PARQUET"
            seen[e.data_file.file_path] = e.data_file.record_count
    assert set(seen) == set(vt.files())
    import pyarrow.parquet as pq

    for f, rc in seen.items():
        assert pq.ParquetFile(f).metadata.num_rows == rc


def test_recover_killed_mid_commit_to_last_good_snapshot(engine, spark):
    """VERDICT r5 item 8 — crash consistency over the Avro-manifest
    chain: a warehouse killed mid-commit (orphan data file landed, the
    manifest publish didn't, the Iceberg emission tore mid-Avro)
    restores to the last good snapshot on restart: recover()
    re-registers the catalog from the manifest chain, VACUUM reclaims
    the torn write, time travel / EXPIRE still agree with the chain,
    and the next commit re-emits a decodable Avro projection."""
    import shutil

    engine.execute("DROP TABLE IF EXISTS crsh;")
    engine.execute("CREATE TABLE crsh (id int32, v string);")
    engine.execute("INSERT INTO crsh (id, v) VALUES (1, 'a'), (2, 'b');")
    engine.execute("INSERT INTO crsh (id, v) VALUES (3, 'c');")
    name = engine._qualify("crsh")
    vt = _vt(engine, name)
    good = vt.current_version()
    good_files = set(vt.files())
    meta_good = iceberg_meta.read_metadata(vt)
    assert meta_good["snapshots"][-1]["manifest-list"].endswith(".avro")

    # the crash, three torn artifacts at once:
    # (a) a data file whose commit never published
    ddir = vt.snapshot_dir()
    orphan = os.path.join(ddir, "part-torn-write.parquet")
    shutil.copyfile(sorted(good_files)[0], orphan)
    # (b) a half-written manifest tmp (link never happened)
    torn_tmp = vt._manifest_path(good + 1) + ".tmp-dead"
    with open(torn_tmp, "w") as f:
        f.write('{"version": %d, "files": [' % (good + 1))
    # (c) a truncated Avro manifest-list from a torn metadata emission
    with open(meta_good["snapshots"][-1]["manifest-list"], "rb") as f:
        head_bytes = f.read(16)
    torn_avro = os.path.join(iceberg_meta.meta_dir(vt), "snap-torn-dead.avro")
    with open(torn_avro, "wb") as f:
        f.write(head_bytes)

    # "restart": the catalog forgets the table; a fresh engine recovers
    spark.sql(f"DROP TABLE {name}")
    from ranger_spark.engine import Engine

    fresh = Engine(spark)
    assert fresh.recover() >= 1

    # the chain ignored the torn tmp: current == last good version
    vt2 = VersionedTable(fresh._manifest["tables"][name]["location"])
    assert vt2.current_version() == good
    assert set(vt2.files()) == good_files
    # VACUUM reclaims the torn write; the table is back to the good rows
    r = fresh.execute(f"VACUUM {name} RETAIN 0 SECONDS;")
    assert "orphan" in r.message
    assert not os.path.exists(orphan)
    assert fresh.execute(
        f"SELECT count(*) AS n FROM {name};"
    ).rows[0][0] == 3
    # time travel against pre-crash versions still matches their manifests
    assert fresh.execute(
        f"SELECT count(*) AS n FROM {name} VERSION AS OF {good - 1};"
    ).rows[0][0] == 2
    # the NEXT commit re-emits the Iceberg projection; the fresh Avro
    # chain decodes (spark-avro = independent decoder) and equals the
    # manifest chain's file list
    fresh.execute(f"INSERT INTO {name} (id, v) VALUES (4, 'd');")
    meta2 = iceberg_meta.read_metadata(vt2)
    head = meta2["snapshots"][-1]
    fmt = "org.apache.spark.sql.avro.AvroFileFormat"
    files_in_chain = set()
    for mf in spark.read.format(fmt).load(head["manifest-list"]).collect():
        entries = spark.read.format(fmt).load(mf.manifest_path).collect()
        files_in_chain |= {e.data_file.file_path for e in entries}
    assert files_in_chain == set(vt2.files())
    # EXPIRE walks the recovered chain without tripping on crash debris
    fresh.execute(f"EXPIRE SNAPSHOTS {name} KEEP 1;")
    assert fresh.execute(
        f"SELECT count(*) AS n FROM {name};"
    ).rows[0][0] == 4
    fresh.execute(f"DROP TABLE {name};")


def test_iceberg_runtime_probe(spark):
    """VERDICT r10 item 7 probe (the s3a probe pattern): a REAL Iceberg
    connector (iceberg-spark-runtime jar) would let these tables be
    written as external-reader-consumable Iceberg instead of managed
    Parquet + the format-v2-shaped metadata projection this repo ships
    (NOTES.md environment-blocked #2). This probe PINS that the blocker
    is the classpath and nothing else: the SparkCatalog class must be
    absent. If this assertion ever fails, the jar appeared — configure
    `spark.sql.catalog.iceberg=org.apache.iceberg.spark.SparkCatalog`
    (hadoop warehouse at a tempdir), route engine CREATE TABLE through
    it, and promote the snapshot/time-travel tests to the real runtime
    the same round."""
    jvm = spark.sparkContext._jvm
    err = None
    try:
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception as e:
        err = str(e)
    assert err is not None, (
        "iceberg-spark-runtime is on the classpath now — promote the "
        "metadata projection to the real connector (see docstring)"
    )
    assert "ClassNotFoundException" in err, (
        f"Iceberg blocked by something other than the classpath: {err[:300]}"
    )
