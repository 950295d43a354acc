"""100-TB-shape rehearsal of the certified WARC→corpus chain
(VERDICT r13 #6): run the PIPELINE (the examples/warc_to_corpus stage
order, the same operators warc_corpus_pipeline_report certifies) over a
replica-scale crawl and record per-stage wall, rows in/out, rows/s, and
shuffle bytes — the throughput curve a scale reviewer asks for after
correctness.

Method: a 5-variant crawl (the report query's feed: primary, mirror
URL, re-archived copy, 2×/3× re-paginations) is packed ONCE per replica
into real per-record-gzip WARC shards via the first-class writer, then
each stage is timed from a persisted copy of the previous stage's
survivors — so a stage's wall is ITS work, not a re-run of the prefix
(matching a production chain that materializes between major stages).
Shuffle bytes come from TaskEnd metrics in an event log isolated per
stage via wall-clock markers (the tools/profile_stages.py method).

Usage:
    python tools/rehearse_warc_chain.py <replica_dir> [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def _build_crawl(spark, src_dir: str, out: str) -> None:
    import pyspark.sql.functions as F

    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    site = (F.col("doc_id") % 50).cast("string")
    did = F.col("doc_id").cast("string")
    t = F.col("text")
    variants = [
        (0, F.concat(F.lit("http://site"), site,
                     F.lit(".example.com/doc/"), did), t),
        (1, F.concat(F.lit("HTTPS://www.site"), site,
                     F.lit(".example.com/doc/"), did,
                     F.lit("?utm_medium=mirror")), t),
        (2, F.concat(F.lit("http://site"), site,
                     F.lit(".example.com/rearchived/"), did), t),
        (3, F.concat(F.lit("http://site"), site,
                     F.lit(".example.com/page2x/"), did),
         F.concat(t, F.lit(" "), t)),
        (4, F.concat(F.lit("http://site"), site,
                     F.lit(".example.com/page3x/"), did),
         F.concat(t, F.lit(" "), t, F.lit(" "), t)),
    ]
    crawl = docs.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(k).alias("k"), url.alias("url"),
                         txt.alias("text"))
                for k, url, txt in variants
            ])
        ).alias("v"),
        F.col("doc_id"),
    ).select(
        (F.col("doc_id") * 5 + F.col("v.k")).alias("row_id"),
        F.col("v.url").alias("url"),
        F.col("v.text").alias("text"),
    )
    (
        crawl.select(
            F.lit("resource").alias("rec_type"),
            F.concat(F.lit("<urn:ranger:crawl:"),
                     F.col("row_id").cast("string"),
                     F.lit(">")).alias("record_id"),
            F.col("url").alias("target_uri"),
            F.lit("2024-01-01T00:00:00Z").alias("warc_date"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
        )
        .repartition(32)
        .write.format("warc")
        .mode("append")
        .save(out)
    )


def rehearse(replica_dir: str, runs: int = 2) -> dict:
    log_dir = tempfile.mkdtemp(prefix="ranger_rehearse_evlog_")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark import StorageLevel
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{log_dir}")
        .config("spark.eventLog.compress", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    from ranger_spark.operators.dedup import (
        exact_dedup_groups,
        lsh_neardup_groups,
    )
    from ranger_spark.operators.text import normalize_text, token_count
    from ranger_spark.operators.urls import canonicalize_url, dedup_by_url
    from ranger_spark.sources.warc_datasource import register_warc_source

    register_warc_source(spark)
    tag = os.path.basename(replica_dir.rstrip("/"))
    crawl_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchcache", f"warc_chain_{tag}",
    )
    if not os.path.isdir(crawl_dir):
        t0 = time.time()
        _build_crawl(spark, replica_dir, crawl_dir + ".build")
        os.rename(crawl_dir + ".build", crawl_dir)
        print(f"crawl packed in {time.time()-t0:.0f}s", file=sys.stderr)
    shard_files = os.listdir(crawl_dir)
    shard_bytes = sum(
        os.path.getsize(os.path.join(crawl_dir, f)) for f in shard_files
    )

    stage_marks: list[tuple[str, float, float, int, int]] = []
    # (name, t_start, t_end, rows_in, rows_out)

    def timed_stage(name, rows_in, materialize):
        best, rows_out = None, None
        for i in range(runs):
            t0 = time.time()
            rows_out = materialize()
            dt = time.time() - t0
            if best is None or dt < best[1] - best[0]:
                best = (t0, t0 + dt)
        stage_marks.append((name, best[0], best[1], rows_in, rows_out))
        return rows_out

    # stage 1: WARC scan + parse (per-record gzip walk, one task/shard)
    def read_crawl():
        return (
            spark.read.format("warc").load(crawl_dir)
            .filter(F.col("rec_type") == "resource")
            .select(
                F.regexp_extract(F.col("record_id"), r":(\d+)>$", 1)
                .cast("bigint").alias("row_id"),
                F.col("target_uri").alias("url"),
                F.decode(F.col("payload"), "utf-8").alias("text"),
            )
        )

    n1 = timed_stage("1_warc_scan", None, lambda: read_crawl().count())
    parsed = read_crawl().persist(StorageLevel.MEMORY_AND_DISK)
    parsed.count()

    # stage 2: blocklist (broadcast anti)
    host = F.regexp_extract(
        canonicalize_url(F.col("url")), r"^[a-z]+://([^/]+)", 1
    )
    blocklist = spark.createDataFrame(
        [("site7.example.com",), ("site13.example.com",),
         ("site21.example.com",)], ["host"],
    )
    s0 = (
        parsed.withColumn("host", host)
        .join(F.broadcast(blocklist), "host", "left_anti")
        .drop("host")
    )
    n2 = timed_stage("2_blocklist", n1, lambda: s0.count())
    s0 = s0.persist(StorageLevel.MEMORY_AND_DISK)
    s0.count()

    # stage 3: URL dedup (canonical digest shuffle + semi-join)
    def url_stage():
        groups = dedup_by_url(s0, "url", "row_id")
        return s0.join(
            groups.select(F.col("keeper_id").alias("row_id")),
            "row_id", "left_semi",
        ).count()

    n3 = timed_stage("3_url_dedup", n2, url_stage)
    groups = dedup_by_url(s0, "url", "row_id")
    s1 = s0.join(
        groups.select(F.col("keeper_id").alias("row_id")),
        "row_id", "left_semi",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    s1.count()

    # stage 4: exact dedup (16-byte digest shuffle)
    def exact_stage():
        g = exact_dedup_groups(s1, "row_id", "text")
        return s1.join(
            g.select(F.col("keeper_id").alias("row_id")), "row_id",
            "left_semi",
        ).count()

    n4 = timed_stage("4_exact_dedup", n3, exact_stage)
    g = exact_dedup_groups(s1, "row_id", "text")
    s2 = s1.join(
        g.select(F.col("keeper_id").alias("row_id")), "row_id", "left_semi"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    s2.count()

    # stage 5: token quality gate (map-only)
    s3_expr = s2.filter(token_count(normalize_text(F.col("text"))) >= 40)
    n5 = timed_stage("5_token_gate", n4, lambda: s3_expr.count())
    s3 = s3_expr.persist(StorageLevel.MEMORY_AND_DISK)
    s3.count()

    # stage 6: LSH near-dup (minhash → bands → verify → keeper filter)
    def lsh_stage():
        ng = lsh_neardup_groups(s3, "row_id", "text", shingle_k=2)
        return s3.join(
            ng.select(F.col("keeper_id").alias("row_id")), "row_id",
            "left_semi",
        ).count()

    n6 = timed_stage("6_lsh_neardup", n5, lsh_stage)

    spark.stop()

    # per-stage shuffle/input bytes from TaskEnd metrics between markers
    metrics = {m[0]: {"sh_read": 0, "sh_write": 0, "input": 0, "run_ms": 0}
               for m in stage_marks}
    log_files = []
    for root, _dirs, files in os.walk(log_dir):
        log_files.extend(
            os.path.join(root, f) for f in files if "appstatus" not in f
        )
    for fn in log_files:
        for line in open(fn, errors="replace"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") != "SparkListenerTaskEnd":
                continue
            info = ev.get("Task Info", {})
            t_launch = info.get("Launch Time", 0) / 1000.0
            tm = ev.get("Task Metrics") or {}
            for name, t0, t1, _ri, _ro in stage_marks:
                if t0 <= t_launch <= t1:
                    m = metrics[name]
                    m["run_ms"] += tm.get("Executor Run Time", 0)
                    m["input"] += (tm.get("Input Metrics") or {}).get(
                        "Bytes Read", 0
                    )
                    m["sh_read"] += (
                        tm.get("Shuffle Read Metrics") or {}
                    ).get("Remote Bytes Read", 0) + (
                        tm.get("Shuffle Read Metrics") or {}
                    ).get("Local Bytes Read", 0)
                    m["sh_write"] += (
                        tm.get("Shuffle Write Metrics") or {}
                    ).get("Shuffle Bytes Written", 0)
                    break

    out = {
        "replica": replica_dir,
        "shards": len(shard_files),
        "shard_mb": round(shard_bytes / 1e6, 1),
        "runs_per_stage": runs,
        "stages": [],
    }
    for name, t0, t1, rows_in, rows_out in stage_marks:
        wall = round(t1 - t0, 2)
        m = metrics[name]
        out["stages"].append({
            "stage": name,
            "wall_s": wall,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "rows_per_s": int((rows_in or rows_out) / wall) if wall else None,
            "executor_run_s": round(m["run_ms"] / 1000.0, 1),
            "input_mb": round(m["input"] / 1e6, 1),
            "shuffle_read_mb": round(m["sh_read"] / 1e6, 2),
            "shuffle_write_mb": round(m["sh_write"] / 1e6, 2),
        })
    return out


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--runs")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else 2
    rep = argv[0] if argv else "/root/repo/.benchcache/sf0.1_x16"
    print(json.dumps(rehearse(rep, runs), indent=1))
