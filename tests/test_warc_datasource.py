"""First-class ``warc`` Python DataSource (sources/warc_datasource.py):
batch read with per-file partitions, rec_type filter pushdown inside the
record walk, landing-zone streaming pickup, and spec-compliant shard
re-export — all over fixtures built by the same record builder the
operator-level tests use (ISO 28500 layout)."""

import gzip
import json  # noqa: F401
import os
import tempfile
import time

import pytest

from ranger_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_warc_datasource")


def _rec(rtype: str, payload: bytes, uri: str = "", rec_id: str = "") -> bytes:
    extra = ""
    if uri:
        extra += f"WARC-Target-URI: {uri}\r\n"
    if rec_id:
        extra += f"WARC-Record-ID: {rec_id}\r\n"
    head = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\n{extra}"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


@pytest.fixture()
def warc_dir():
    tmp = tempfile.mkdtemp(prefix="warc_ds_")
    with open(os.path.join(tmp, "a.warc"), "wb") as f:
        f.write(
            _rec("warcinfo", b"v: 1\n")
            + _rec("response", b"hello", "http://x/1", "<urn:uuid:r1>")
            + _rec("request", b"GET /")
        )
    with open(os.path.join(tmp, "b.warc.gz"), "wb") as f:
        f.write(gzip.compress(_rec("response", b"world!", "http://x/2")))
    return tmp


def test_batch_read_all_records(spark, warc_dir):
    df = spark.read.format("warc").load(warc_dir)
    rows = df.orderBy("path", "rec_index").collect()
    assert len(rows) == 4
    assert [r.rec_type for r in rows] == [
        "warcinfo", "response", "request", "response",
    ]
    # gzip'd archive decoded transparently; payload bytes intact
    assert rows[3].payload == b"world!"
    assert rows[3].content_length == 6
    assert rows[1].record_id == "<urn:uuid:r1>"
    # one partition per archive file
    assert df.rdd.getNumPartitions() == 2


def test_rec_type_filter_is_pushed(spark, warc_dir):
    df = spark.read.format("warc").load(warc_dir).filter("rec_type = 'response'")
    rows = df.orderBy("target_uri").collect()
    assert [r.target_uri for r in rows] == ["http://x/1", "http://x/2"]
    # the equality must reach the source (no post-scan Filter on rec_type)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "Filter" not in plan.split("Scan")[0]


def test_unsupported_filter_still_correct(spark, warc_dir):
    # content_length is not pushable — Spark must re-apply it post-scan
    df = (
        spark.read.format("warc").load(warc_dir)
        .filter("rec_type = 'response' AND content_length > 5")
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].payload == b"world!"


def test_in_filter_pushdown(spark, warc_dir):
    df = spark.read.format("warc").load(warc_dir).filter(
        "rec_type IN ('request', 'warcinfo')"
    )
    assert sorted(r.rec_type for r in df.collect()) == ["request", "warcinfo"]


def test_write_round_trip(spark, warc_dir):
    out = tempfile.mkdtemp(prefix="warc_out_")
    src = (
        spark.read.format("warc").load(warc_dir)
        .filter("rec_type = 'response'")
        .select("rec_type", "record_id", "target_uri", "warc_date", "payload")
    )
    src.write.format("warc").mode("append").save(out)
    back = spark.read.format("warc").load(out)
    rows = back.orderBy("content_length").collect()
    assert [r.payload for r in rows] == [b"hello", b"world!"]
    assert all(r.rec_type == "response" for r in rows)
    # ids survive when present, are minted when absent
    assert "<urn:uuid:r1>" in {r.record_id for r in rows}
    # shards are per-record gzip members (the Common Crawl layout)
    shard = [f for f in os.listdir(out) if f.endswith(".warc.gz")][0]
    with open(os.path.join(out, shard), "rb") as f:
        assert f.read(2) == b"\x1f\x8b"


def test_streaming_picks_up_new_files(spark):
    tmp = tempfile.mkdtemp(prefix="warc_stream_")
    with open(os.path.join(tmp, "a.warc"), "wb") as f:
        f.write(_rec("response", b"one"))
    q = (
        spark.readStream.format("warc").load(tmp)
        .writeStream.format("memory").queryName("warc_stream_t")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("warc_stream_t").count() < 1:
            time.sleep(0.5)
        with open(os.path.join(tmp, "b.warc"), "wb") as f:
            f.write(_rec("response", b"two") + _rec("request", b"x"))
        while time.time() < deadline and spark.table("warc_stream_t").count() < 3:
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.table("warc_stream_t").collect()
    got = sorted((os.path.basename(r.path), r.rec_index, r.rec_type) for r in rows)
    assert got == [
        ("a.warc", 0, "response"),
        ("b.warc", 0, "response"),
        ("b.warc", 1, "request"),
    ]


def test_no_files_errors(spark):
    empty = tempfile.mkdtemp(prefix="warc_empty_")
    with pytest.raises(Exception, match="no .warc"):
        spark.read.format("warc").load(empty).collect()


def test_stream_to_stream_warc_relay(spark, warc_dir):
    """readStream warc → writeStream warc: the landing-zone relay shape
    (filter a crawl while it lands, re-export in the same container)."""
    out = tempfile.mkdtemp(prefix="warc_relay_")
    ckpt = tempfile.mkdtemp(prefix="warc_relay_ckpt_")
    q = (
        spark.readStream.format("warc").load(warc_dir)
        .filter("rec_type = 'response'")
        .select("rec_type", "record_id", "target_uri", "warc_date", "payload")
        .writeStream.format("warc")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.format("warc").load(out)
    rows = back.orderBy("content_length").collect()
    assert [r.payload for r in rows] == [b"hello", b"world!"]
    assert all(r.rec_type == "response" for r in rows)


# ---------------------------------------------------------------------------
# property-based: build→walk round-trip over random archives
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _recs = st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "metadata", "resource"]),
            st.binary(max_size=200),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=100, deadline=None)
    @given(recs=_recs, gz=st.booleans())
    def test_prop_walk_roundtrip(recs, gz):
        from ranger_spark.operators.warc import walk_warc_records

        buf = b"".join(_rec(t, p) for t, p in recs)
        if gz:
            buf = gzip.compress(buf)
        got = [
            (h.get("warc-type"), p) for _v, h, p in walk_warc_records(buf)
        ]
        assert got == recs
except ImportError:  # pragma: no cover
    pass


def test_strip_http_headers_option(spark):
    tmp = tempfile.mkdtemp(prefix="warc_http_")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    )
    with open(os.path.join(tmp, "c.warc"), "wb") as f:
        f.write(_rec("response", http, "http://x/h") + _rec("resource", b"raw"))
    df = (
        spark.read.format("warc")
        .option("strip_http_headers", "true")
        .load(tmp)
        .orderBy("rec_index")
    )
    rows = df.collect()
    assert rows[0].http_status == 200
    assert rows[0].payload == b"<html>hi</html>"
    assert rows[0].content_length == len(b"<html>hi</html>")
    # non-HTTP payloads pass through with null status
    assert rows[1].http_status is None and rows[1].payload == b"raw"
    # status is pushable: 200-only filter prunes inside the walk
    ok = (
        spark.read.format("warc")
        .option("strip_http_headers", "true")
        .load(tmp)
        .filter("http_status = 200")
        .collect()
    )
    assert len(ok) == 1 and ok[0].target_uri == "http://x/h"
    # without the option the raw HTTP bytes are untouched
    raw = spark.read.format("warc").load(tmp).orderBy("rec_index").collect()
    assert raw[0].payload == http and raw[0].http_status is None


def test_non_ascii_headers_round_trip(spark):
    """WARC 1.0 headers are UTF-8 (ISO 28500) — non-ASCII IRIs are
    routine in crawl data and must survive writer→reader unmangled."""
    out = tempfile.mkdtemp(prefix="warc_utf8_")
    uri = "http://example.com/café/日本語"
    df = spark.createDataFrame(
        [("resource", "<urn:doc:é1>", uri, "", b"payload")],
        "rec_type string, record_id string, target_uri string, "
        "warc_date string, payload binary",
    )
    df.write.format("warc").mode("append").save(out)
    back = spark.read.format("warc").load(out).collect()
    assert len(back) == 1
    assert back[0].target_uri == uri
    assert back[0].record_id == "<urn:doc:é1>"
    assert back[0].payload == b"payload"


def test_streaming_offset_tracks_names_not_count(spark):
    """A late-landing file that sorts BEFORE consumed names must still
    be read exactly once (name-set offsets; a count-based offset would
    skip it and duplicate the displaced tail)."""
    tmp = tempfile.mkdtemp(prefix="warc_late_")
    with open(os.path.join(tmp, "m.warc"), "wb") as f:
        f.write(_rec("response", b"mid"))
    q = (
        spark.readStream.format("warc").load(tmp)
        .writeStream.format("memory").queryName("warc_late_t")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("warc_late_t").count() < 1:
            time.sleep(0.5)
        # lands AFTER m.warc was consumed but sorts BEFORE it
        with open(os.path.join(tmp, "a.warc"), "wb") as f:
            f.write(_rec("response", b"early-name"))
        while time.time() < deadline and spark.table("warc_late_t").count() < 2:
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.table("warc_late_t").collect()
    payloads = sorted(r.payload for r in rows)
    assert payloads == [b"early-name", b"mid"], payloads


def test_failed_write_leaves_no_readable_shard(spark, warc_dir):
    """A task that dies mid-write must not leave a truncated *.warc.gz
    the reader would choke on: shards stream to an .inprogress temp and
    publish by rename only on success."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="warc_fail_")
    src = (
        spark.read.format("warc").load(warc_dir)
        .select(
            "rec_type", "record_id", "target_uri", "warc_date",
            # blow up inside the writer's input iterator on one row
            F.when(F.col("content_length") > 5, F.col("payload"))
            .otherwise(F.raise_error("boom"))
            .alias("payload"),
        )
    )
    try:
        src.write.format("warc").mode("append").save(out)
        raise AssertionError("expected the job to fail")
    except Exception as e:
        assert "boom" in str(e)
    # no half-written shard is visible to the reader's listing
    visible = [f for f in os.listdir(out) if f.endswith((".warc", ".warc.gz"))]
    assert visible == [], visible


def test_offset_migration_and_pruning(spark):
    """The stream reader must accept the earlier count-based offset
    format ({'files': n} → first n sorted paths consumed) and must
    prune deleted files from the name-set offset so checkpoints stay
    bounded by the live zone."""
    from ranger_spark.sources.warc_datasource import WarcStreamReader

    tmp = tempfile.mkdtemp(prefix="warc_mig_")
    for nm, payload in [("a.warc", b"one"), ("b.warc", b"two")]:
        with open(os.path.join(tmp, nm), "wb") as f:
            f.write(_rec("response", payload))
    r = WarcStreamReader({"path": tmp})
    # legacy offset: first file already consumed
    rows, end = r.read({"files": 1})
    assert [t[-1] for t in rows] == [b"two"]
    assert [os.path.basename(p) for p in end["seen"]] == ["a.warc", "b.warc"]
    # retention removes a.warc → next offset prunes it
    os.remove(os.path.join(tmp, "a.warc"))
    rows2, end2 = r.read(end)
    assert list(rows2) == []
    assert [os.path.basename(p) for p in end2["seen"]] == ["b.warc"]
    # replay between offsets reads exactly the delta
    replay = list(r.readBetweenOffsets({"seen": []}, end2))
    assert [t[-1] for t in replay] == [b"two"]


# ---------------------------------------------------------------------------
# property-based: the writer's packer vs the reader's walker
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _uri_text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
        max_size=24,
    ).map(lambda s: s.replace("\r", "").replace("\n", "").strip())

    _row = st.fixed_dictionaries(
        {
            "rec_type": st.sampled_from(
                ["response", "request", "resource", "metadata", ""]
            ),
            "record_id": _uri_text,
            "target_uri": _uri_text,
            "warc_date": st.sampled_from(["", "2024-01-01T00:00:00Z"]),
            "payload": st.binary(max_size=300),
        }
    )

    @settings(max_examples=150, deadline=None)
    @given(rows=st.lists(_row, min_size=1, max_size=8), gz=st.booleans())
    def test_prop_pack_then_walk(rows, gz):
        import gzip as _gzip

        from ranger_spark.operators.warc import walk_warc_records
        from ranger_spark.sources.warc_datasource import pack_warc_record

        buf = b"".join(pack_warc_record(d) for d in rows)
        if gz:
            buf = _gzip.compress(buf)
        got = list(walk_warc_records(buf))
        assert len(got) == len(rows)
        for (version, headers, payload), d in zip(got, rows):
            assert version == "WARC/1.0"
            assert payload == d["payload"]
            assert headers["warc-type"] == (d["rec_type"] or "resource")
            if d["target_uri"]:
                assert headers["warc-target-uri"] == d["target_uri"]
            if d["record_id"]:
                assert headers["warc-record-id"] == d["record_id"]
            assert int(headers["content-length"]) == len(d["payload"])
except ImportError:  # pragma: no cover
    pass
