"""First-class ``warc`` data source (Spark 4 Python DataSource API).

Makes WARC archives (ISO 28500 — the Common Crawl container, the entry
format of every web-scale LLM corpus) a native Spark format::

    spark.dataSource.register(WarcDataSource)       # or session.get_spark
    df = spark.read.format("warc").load("/data/crawl/*.warc.gz")
    stream = spark.readStream.format("warc").load("/landing/warc/")
    df.write.format("warc").mode("append").save("/out/shards")

versus the operator-level ``parse_warc_records`` (operators/warc.py,
which takes payloads already in a DataFrame column). As a DataSource the
archive walk gets Spark's full source contract:

- **partitioning**: one input partition per archive file — Common Crawl
  ships ~1 GB gzip'd segments, and per-record gzip members make the
  file the natural split unit (same policy as Spark's own binaryFile /
  non-splittable-codec text). A 100 TB crawl is ~100k files → ~100k
  tasks, well past any cluster's slot count, so file granularity is not
  a parallelism limit.
- **filter pushdown**: ``rec_type``/``version``/``path`` equality (and
  IN/IsNotNull) are evaluated inside the record walk before payload
  rows are materialized — `WHERE rec_type = 'response'` (the standard
  crawl-processing predicate: ~⅓ of records) never builds the request/
  metadata rows. Remaining filters are returned to Spark unsupported.
- **streaming**: a SimpleDataSourceStreamReader over the landing-zone
  listing — each micro-batch picks up newly-landed archives. The
  offset carries the consumed file NAMES (a count over a sorted
  listing would skip a late file sorting before consumed names and
  duplicate the displaced tail); archives are immutable once landed,
  so between-offset replay is deterministic.
- **write**: a DataSourceWriter packing (rec_type, record_id,
  target_uri, warc_date, payload) rows back into spec-compliant
  ``.warc.gz`` shards, one per partition — so a cleaned corpus can be
  re-exported in the same container it arrived in. Shards stream to an
  ``.inprogress`` temp invisible to the reader and publish by rename;
  job abort removes already-published shards, so a failed write leaves
  the directory as it found it.

Reference: the reference engine has no WARC support (SURVEY §2 north-star
extension); format details from the public ISO 28500 / WARC 1.0 spec.
"""

from __future__ import annotations

import glob as _glob
import gzip
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("rec_index", IntegerType()),
        StructField("version", StringType()),
        StructField("rec_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_length", LongType()),
        StructField("http_status", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def _split_http(payload: bytes):
    """Common Crawl response records carry the raw HTTP message; split
    status + body (``strip_http_headers`` option). Returns
    (status | None, body) — non-HTTP payloads pass through unchanged."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, payload
    head = payload[:sep]
    line = head.split(b"\r\n", 1)[0]
    parts = line.split()
    status = None
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    return status, payload[sep + 4:]

# columns a pushed equality/IN filter can prune inside the walk without
# touching payload materialization
_PUSHABLE = {"path", "rec_type", "version", "record_id", "target_uri",
             "http_status"}


def _list_warc_files(path: str) -> list[str]:
    """Resolve a file / directory / glob option into a sorted file list."""
    if os.path.isdir(path):
        pats = [os.path.join(path, "*.warc"), os.path.join(path, "*.warc.gz")]
        files = [f for p in pats for f in _glob.glob(p)]
    else:
        files = _glob.glob(path)
    return sorted(f for f in files if os.path.isfile(f))


def _record_rows(path: str, predicate, strip_http: bool = False) -> Iterator[tuple]:
    from ranger_spark.operators.warc import walk_warc_records

    with open(path, "rb") as f:
        buf = f.read()
    for idx, (version, headers, payload) in enumerate(walk_warc_records(buf)):
        status = None
        if strip_http:
            status, payload = _split_http(payload)
        row = (
            path,
            idx,
            version,
            headers.get("warc-type", ""),
            headers.get("warc-record-id", ""),
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            len(payload),
            status,
            payload,
        )
        if predicate(row):
            yield row


# Arrow batch size for the batch reader: bounds worker memory at
# ~batch_rows × avg payload; 1024 records ≈ tens of MB on crawl data.
_ARROW_BATCH_ROWS = 1024

_ARROW_TYPES = None


def _arrow_schema():
    global _ARROW_TYPES
    if _ARROW_TYPES is None:
        import pyarrow as pa

        _ARROW_TYPES = pa.schema(
            [
                ("path", pa.string()),
                ("rec_index", pa.int32()),
                ("version", pa.string()),
                ("rec_type", pa.string()),
                ("record_id", pa.string()),
                ("target_uri", pa.string()),
                ("warc_date", pa.string()),
                ("content_length", pa.int64()),
                ("http_status", pa.int32()),
                ("payload", pa.binary()),
            ]
        )
    return _ARROW_TYPES


def _record_batches(path: str, predicate, strip_http: bool = False):
    """Arrow-native read path: rows cross the Python→JVM boundary as
    RecordBatches (zero per-row pickling — the same reason the repo's
    operators are mapInPandas, applied to the source contract)."""
    import pyarrow as pa

    schema = _arrow_schema()
    pend: list[tuple] = []
    for row in _record_rows(path, predicate, strip_http):
        pend.append(row)
        if len(pend) >= _ARROW_BATCH_ROWS:
            yield pa.RecordBatch.from_arrays(
                [pa.array(col, type=f.type)
                 for col, f in zip(zip(*pend), schema)],
                schema=schema,
            )
            pend = []
    if pend:
        yield pa.RecordBatch.from_arrays(
            [pa.array(col, type=f.type) for col, f in zip(zip(*pend), schema)],
            schema=schema,
        )


def _compile_pushed(pushed: list) -> "callable":
    """Compile supported pushed filters into one row predicate.

    Works on the pre-materialized tuple (column order of SCHEMA), so a
    rejected record costs only the header walk — its payload row never
    reaches Spark.
    """
    if not pushed:
        return lambda row: True
    idx = {f.name: i for i, f in enumerate(SCHEMA.fields)}
    checks = []
    for flt in pushed:
        col = idx[flt.attribute[0]]
        if isinstance(flt, EqualTo):
            checks.append(lambda row, c=col, v=flt.value: row[c] == v)
        elif isinstance(flt, In):
            checks.append(lambda row, c=col, v=set(flt.value): row[c] in v)
        elif isinstance(flt, IsNotNull):
            checks.append(lambda row, c=col: row[c] is not None)
    return lambda row: all(ch(row) for ch in checks)


@dataclass
class WarcFilePartition(InputPartition):
    path: str


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("warc source requires a path, e.g. "
                             ".load('/dir-or-glob')")
        self._strip_http = str(
            options.get("strip_http_headers", "false")
        ).lower() == "true"
        self._pushed: list = []

    def pushFilters(self, filters):
        for flt in filters:
            if (
                isinstance(flt, (EqualTo, In, IsNotNull))
                and len(flt.attribute) == 1
                and flt.attribute[0] in _PUSHABLE
            ):
                self._pushed.append(flt)
            else:
                yield flt  # unsupported → Spark re-applies it

    def partitions(self):
        files = _list_warc_files(self._path)
        if not files:
            raise FileNotFoundError(f"no .warc/.warc.gz files match {self._path}")
        return [WarcFilePartition(p) for p in files]

    def read(self, partition: WarcFilePartition):
        return _record_batches(
            partition.path, _compile_pushed(self._pushed), self._strip_http
        )


class WarcStreamReader(SimpleDataSourceStreamReader):
    """Landing-zone ingest: the offset carries the full PATHS of
    consumed files, not a count — a count over a sorted listing
    silently skips a late-landing file that sorts before already-
    consumed names and re-reads the displaced tail (and basenames alone
    would collide across directories under a glob). Archives are
    immutable once landed, so ``readBetweenOffsets`` (replay = exactly
    the paths in ``end`` minus ``start``) is deterministic after
    restart. Paths that retention/compaction removed from the zone are
    pruned from the offset, bounding it by the LIVE zone size — with
    the documented consequence that re-creating a deleted file under
    the same path re-ingests it (landing zones use unique names).
    """

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("warc stream requires a path")
        self._strip_http = str(
            options.get("strip_http_headers", "false")
        ).lower() == "true"

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _seen(self, start: dict, files: list[str]) -> set[str]:
        if "seen" in start:
            return set(start["seen"])
        if "files" in start:
            # migrate the earlier count-based offset format: first n
            # files of the sorted listing were consumed
            return set(files[: int(start["files"])])
        raise ValueError(f"unrecognized warc stream offset: {start!r}")

    def read(self, start: dict):
        files = _list_warc_files(self._path)
        seen = self._seen(start, files)
        new = [p for p in files if p not in seen]
        # materialized list, not a generator: pyspark pickles the batch
        # into its prefetch cache for offset replay, so the rows must be
        # picklable. A deep first backlog should be pre-drained with the
        # BATCH reader (per-file partitions), then streamed from the
        # current offset.
        rows: list[tuple] = []
        for p in new:
            rows.extend(_record_rows(p, lambda row: True, self._strip_http))
        # prune names the zone no longer holds (retention/compaction)
        live_seen = (seen & set(files)) | set(new)
        return iter(rows), {"seen": sorted(live_seen)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_warc_files(self._path)
        want = set(end.get("seen", files)) - self._seen(start, files)
        for p in files:
            if p in want:
                yield from _record_rows(p, lambda row: True, self._strip_http)


@dataclass
class WarcCommitMessage(WriterCommitMessage):
    file: str
    records: int


def pack_warc_record(d: dict) -> bytes:
    """Pack one row dict into a spec-framed WARC 1.0 record (CRLF
    framing, UTF-8 headers, Content-Length = payload byte count,
    record id minted when absent). Pure function so the writer's
    framing is property-testable against walk_warc_records without a
    Spark task context."""
    payload = bytes(d.get("payload") or b"")
    rec_id = d.get("record_id") or f"<urn:uuid:{uuid.uuid4()}>"
    headers = [
        ("WARC-Type", d.get("rec_type") or "resource"),
        ("WARC-Record-ID", rec_id),
    ]
    if d.get("target_uri"):
        headers.append(("WARC-Target-URI", d["target_uri"]))
    if d.get("warc_date"):
        headers.append(("WARC-Date", d["warc_date"]))
    headers.append(("Content-Length", str(len(payload))))
    head = "WARC/1.0\r\n" + "".join(
        f"{k}: {v}\r\n" for k, v in headers
    ) + "\r\n"
    return head.encode("utf-8") + payload + b"\r\n\r\n"


class WarcWriter(DataSourceWriter):
    """Pack rows back into spec-compliant gzip'd WARC shards (one file
    per non-empty partition — the shard layout every crawl pipeline
    expects). Input rows need (rec_type, record_id, target_uri,
    warc_date, payload); missing ids are minted as urn:uuid."""

    def __init__(self, options, schema: StructType):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("warc writer requires a path directory")
        self._cols = [f.name for f in schema.fields]
        # minted ONCE on the driver and pickled to every task: shards of
        # this job are identifiable by name, so a job-level abort can
        # sweep them even when a killed task published its shard but
        # died before its commit message reached the driver (observed
        # race under load, r12) — without touching earlier jobs' shards
        # in the same append directory
        self._job_tag = uuid.uuid4().hex[:8]

    def write(self, it: Iterator) -> WarcCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = os.path.join(
            self._dir,
            f"part-{pid:05d}-{self._job_tag}-{uuid.uuid4().hex[:8]}.warc.gz",
        )
        part = name + ".inprogress"  # invisible to the reader's listing
        n = 0
        f = None
        try:
            for row in it:
                d = row.asDict() if hasattr(row, "asDict") else dict(zip(self._cols, row))
                if f is None:  # lazy: empty partitions create no shard
                    os.makedirs(self._dir, exist_ok=True)
                    f = open(part, "wb")
                # one gzip member per record (the Common Crawl layout) so
                # a future range reader can split on member boundaries;
                # streamed out as produced — the shard never sits in RAM
                f.write(gzip.compress(pack_warc_record(d)))
                n += 1
        except BaseException:
            # failed task: remove the temp so retries don't accumulate
            # .inprogress litter (they use fresh uuid names anyway)
            if f is not None:
                f.close()
                f = None
                try:
                    os.remove(part)
                except OSError:
                    pass
            raise
        finally:
            if f is not None:
                f.close()
        if n == 0:
            return WarcCommitMessage(file="", records=0)
        # atomic publish: a task that died mid-write leaves only an
        # .inprogress file the reader never lists; retries use a fresh
        # uuid name, so no truncated shard can poison later reads
        os.rename(part, name)
        return WarcCommitMessage(file=name, records=n)

    def commit(self, messages) -> None:
        return None

    def abort(self, messages) -> None:
        # job-level rollback: remove shards that SUCCEEDED tasks already
        # published, so a failed job leaves the directory as it found it
        # (failed tasks only ever left invisible .inprogress temps)
        for m in messages:
            if m is not None and getattr(m, "file", ""):
                try:
                    os.remove(m.file)
                except OSError:
                    pass
        # belt-and-braces for the publish/kill race: a task killed by
        # the job abort may have renamed its shard but died before its
        # commit message reached the driver, so it appears as None in
        # `messages` — sweep every file carrying this job's tag
        # (committed-batch shards of OTHER jobs never match the tag)
        import glob

        for path in glob.glob(
            os.path.join(self._dir, f"part-*-{self._job_tag}-*")
        ):
            try:
                os.remove(path)
            except OSError:
                pass


class WarcStreamWriter(DataSourceStreamWriter):
    """Streaming WARC export: each micro-batch partition becomes one
    ``part-<batch>-<partition>-*.warc.gz`` shard (same packing as the
    batch writer). Failed batches leave only uncommitted shards behind,
    which ``abort`` removes — at-least-once by shard, exactly-once for
    readers that key on (record_id) like every crawl consumer does."""

    def __init__(self, options, schema: StructType):
        self._inner = WarcWriter(options, schema)
        self._dir = self._inner._dir

    def write(self, it: Iterator) -> WarcCommitMessage:
        return self._inner.write(it)

    def commit(self, messages, batchId: int) -> None:
        # shards are self-contained; commit is the no-op of an
        # append-only landing zone (offsets live in the query checkpoint)
        return None

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and getattr(m, "file", ""):
                try:
                    os.remove(m.file)
                except OSError:
                    pass


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> WarcStreamReader:
        return WarcStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> WarcWriter:
        return WarcWriter(self.options, schema)

    def streamWriter(self, schema: StructType, overwrite: bool) -> WarcStreamWriter:
        return WarcStreamWriter(self.options, schema)


def register_warc_source(spark) -> None:
    """Idempotent registration of the ``warc`` format on a session."""
    # pushFilters requires the (off-by-default in 4.1) Python-source
    # pushdown flag; without it Spark refuses any reader that implements
    # the method. Runtime SQL conf — safe to set per-session.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)
