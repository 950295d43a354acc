"""Structured Streaming tests: file ingest with CDC feed, watermarked
windows, streaming dedup (availableNow triggers → deterministic drains)."""

from __future__ import annotations

import json
import tempfile
import time
from pathlib import Path

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _drain(query, timeout=60):
    query.awaitTermination(timeout)
    assert not query.isActive


@pytest.fixture(scope="module", autouse=True)
def sdb(engine):
    engine.execute("CREATE DATABASE IF NOT EXISTS stest;")
    yield
    engine.spark.sql("DROP DATABASE IF EXISTS stest CASCADE")


def test_stream_ingest_with_cdc(spark, engine):
    from ranger_spark.streaming.ingest import read_cdc_since, stream_ingest

    tmp = Path(tempfile.mkdtemp(prefix="stream_src_"))
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    engine.execute("DROP TABLE IF EXISTS stest.ingested;")
    engine.execute(
        "CREATE TABLE stest.ingested "
        "(event_id int64, user_id int64, event_type string, value float64);"
    )
    for i in range(3):
        with open(tmp / f"f{i}.json", "w") as f:
            for j in range(10):
                f.write(
                    json.dumps(
                        {
                            "event_id": i * 10 + j,
                            "user_id": j % 3,
                            "event_type": "click",
                            "value": float(j),
                        }
                    )
                    + "\n"
                )
    q = stream_ingest(
        spark,
        str(tmp),
        EVENT_SCHEMA,
        "stest.ingested",
        ckpt,
        max_files_per_trigger=1,
        cdc_table="stest.cdc_log",
    )
    _drain(q)
    assert spark.table("stest.ingested").count() == 30
    cdc = read_cdc_since(spark, "stest.cdc_log").collect()
    assert sum(r.row_count for r in cdc) == 30
    assert all(r.op == "INSERT" and r.table_name == "stest.ingested" for r in cdc)
    # incremental subscriber: nothing new after the max seen batch
    last = max(r.batch_id for r in cdc)
    assert read_cdc_since(spark, "stest.cdc_log", last).count() == 0


def test_windowed_counts_stream(spark):
    from ranger_spark.streaming.ingest import windowed_counts

    tmp = Path(tempfile.mkdtemp(prefix="stream_win_"))
    with open(tmp / "events.json", "w") as f:
        for h, n in [(0, 3), (1, 2)]:
            for i in range(n):
                f.write(
                    json.dumps(
                        {
                            "ts": f"2024-01-01T0{h}:1{i}:00.000Z",
                            "event_type": "view",
                            "value": 1.0,
                        }
                    )
                    + "\n"
                )
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(tmp))
    out = windowed_counts(stream, window="1 hour", watermark="2 hours")
    # complete mode: append-mode emission waits for the watermark to pass a
    # window's end, which a single availableNow drain never does
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r.window_start.hour: r.cnt for r in spark.table("win_counts").collect()}
    assert rows == {0: 3, 1: 2}


def test_streaming_dedup(spark):
    from ranger_spark.streaming.ingest import streaming_dedup

    tmp = Path(tempfile.mkdtemp(prefix="stream_dd_"))
    docs = [
        {"ts": "2024-01-01T00:00:00.000Z", "doc_id": 1, "text": "Hello World"},
        {"ts": "2024-01-01T00:01:00.000Z", "doc_id": 2, "text": "hello, world!"},
        {"ts": "2024-01-01T00:02:00.000Z", "doc_id": 3, "text": "fresh content"},
    ]
    with open(tmp / "docs.json", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(tmp))
    deduped = streaming_dedup(stream, "ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    kept = sorted(r.doc_id for r in spark.table("dd_out").collect())
    # docs 1 and 2 normalize identically → one survives; 3 survives
    assert len(kept) == 2 and 3 in kept


def test_stream_ingest_with_quality_transform(spark, engine):
    """Streaming quality gate: the same map-only Gopher/alpha-fraction
    expressions the batch operators use run on every micro-batch via
    stream_ingest's transform hook — low-quality docs never reach the
    table."""
    import json
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ranger_spark.operators.text import gopher_metrics
    from ranger_spark.streaming.ingest import stream_ingest

    src = tempfile.mkdtemp(prefix="stream_q_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_q_ckpt_")
    engine.execute("CREATE DATABASE IF NOT EXISTS strq;")
    engine.execute("DROP TABLE IF EXISTS strq.docs;")
    engine.execute("CREATE TABLE strq.docs (doc_id int64, text string);")
    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps with joy today"},
        {"doc_id": 2, "text": "#### #### #### ####"},  # symbol spam → drop
        {"doc_id": 3, "text": "numbers 1 2 3 4 5 6 7 8"},  # low alpha → drop
        {"doc_id": 4, "text": "another fine sentence that reads well"},
    ]
    with open(f"{src}/batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )

    def quality_gate(df):
        g = gopher_metrics(F.col("text"))
        return (
            df.withColumn("__alpha", g["alpha_word_frac"])
            .withColumn("__sym", g["symbol_word_ratio"])
            .filter((F.col("__alpha") > 0.8) & (F.col("__sym") < 0.1))
            .drop("__alpha", "__sym")
        )

    q = stream_ingest(
        spark, src, schema, "strq.docs", ckpt, transform=quality_gate
    )
    q.awaitTermination(120)
    got = sorted(
        r.doc_id for r in spark.table("strq.docs").select("doc_id").collect()
    )
    assert got == [1, 4]
    engine.spark.sql("DROP DATABASE strq CASCADE")


def test_stream_windowed_daily_matches_batch(spark):
    """The registry's streaming query equals the batch GROUP BY it claims
    to be, and a rerun in the same session replaces the memory sink."""
    from ranger_spark.queries.streaming_q import stream_windowed_daily
    from ranger_spark.tables import load

    sf = "/root/testdata/sf0.001"
    got = stream_windowed_daily(spark, sf)
    want = (
        load(spark, sf, "events")
        .groupBy(
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0
    # rerun must not fail on the live sink name and must be identical
    again = stream_windowed_daily(spark, sf)
    assert {tuple(r) for r in again.collect()} == w


def test_watermark_exactly_once_dedup_across_batches(spark):
    """Streaming dedup exactly-once contract across micro-batches: a key
    replayed while its state lives is suppressed by the dedup state; a
    key replayed after the watermark horizon (state evicted) arrives
    below the watermark and is dropped as late input — either way the
    sink sees each (k, ts) exactly once, with state bounded by the
    horizon. This is the contract the registry's stream_dedup_keys
    relies on at scale."""
    import json
    import os
    import tempfile
    import time as _time
    from collections import Counter
    from pathlib import Path

    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [StructField("k", StringType()), StructField("ts", TimestampType())]
    )
    tmp = Path(tempfile.mkdtemp(prefix="late_src_"))
    batches = [
        [("a", "2024-01-01 12:00:00")],
        # dup of a within the horizon + a watermark-advancing row
        [("a", "2024-01-01 12:00:00"), ("adv", "2024-01-01 14:00:00")],
        # push the watermark well past a's event time (state evicted)
        [("noop", "2024-01-01 14:30:00")],
        # replay a after the horizon: late input, dropped
        [("a", "2024-01-01 12:00:00")],
    ]
    now = _time.time()
    for i, rows in enumerate(batches):
        path = tmp / f"b{i}.json"
        with open(path, "w") as f:
            for k, ts in rows:
                f.write(json.dumps({"k": k, "ts": ts}) + "\n")
        # the file source orders micro-batches by modification time
        os.utime(path, (now + 60 * i, now + 60 * i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp))
    )
    dd = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicates(["k", "ts"])
        .select("k")
    )
    q = (
        dd.writeStream.format("memory")
        .queryName("late_drop_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    counts = Counter(r.k for r in spark.table("late_drop_sink").collect())
    # four input occurrences collapse to exactly one emission per key
    assert counts == {"a": 1, "adv": 1, "noop": 1}


def test_stream_merge_upsert_is_snapshot_committed(spark):
    """The foreachBatch MERGE path lands as REAL snapshot commits: after
    the availableNow drain, the rollup table's snapshot chain contains
    merge commits and VERSION AS OF can read the pre-merge (empty)
    state — the lakehouse property the registry query claims."""
    from ranger_spark.queries import load_all

    from ranger_spark.engine import Engine

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    df = reg["stream_merge_upsert_rollup"].builder(spark, sf)
    engine = Engine(spark)
    n = df.count()
    assert n > 0

    import hashlib

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    snaps = engine.execute(f"SHOW SNAPSHOTS FROM strmrg_{tag}.rollup;").rows
    assert len(snaps) >= 2  # create + >=1 merge commit
    # earliest snapshot is the empty just-created table
    first_version = min(r[0] for r in snaps)
    pre = engine.execute(
        f"SELECT count(*) AS n FROM strmrg_{tag}.rollup "
        f"VERSION AS OF {first_version};"
    ).rows
    assert pre == [(0,)]
    # live read agrees with the returned DataFrame
    live = engine.execute(
        f"SELECT count(*) AS n FROM strmrg_{tag}.rollup;"
    ).rows
    assert live == [(n,)]


# ---------------------------------------------------------------------------
# streaming/runtime.py (r15): drain_scope / state_partitions contracts
# ---------------------------------------------------------------------------


def test_state_partitions_resolution_order(spark, monkeypatch):
    from ranger_spark.streaming.runtime import state_partitions

    monkeypatch.delenv("RANGER_STREAM_STATE_PARTITIONS", raising=False)
    # derived: one partition per 64 MB, floored
    assert state_partitions(spark, 0) == 4
    assert state_partitions(spark, 0, floor=8) == 8
    assert state_partitions(spark, 300 << 20) == 5
    # env overrides derived
    monkeypatch.setenv("RANGER_STREAM_STATE_PARTITIONS", "13")
    assert state_partitions(spark, 300 << 20) == 13
    # conf overrides env
    spark.conf.set("spark.ranger.stream.statePartitions", "7")
    try:
        assert state_partitions(spark, 300 << 20) == 7
    finally:
        spark.conf.unset("spark.ranger.stream.statePartitions")


def test_drain_scope_restores_conf_and_removes_checkpoint(spark):
    import os

    from ranger_spark.streaming.runtime import drain_scope

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with drain_scope(spark, 0, "t_scope") as ckpt:
        assert os.path.isdir(ckpt)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert not os.path.exists(ckpt)


def test_drain_scope_restores_on_error(spark):
    from ranger_spark.streaming.runtime import drain_scope

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError):
        with drain_scope(spark, 0, "t_scope_err"):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
