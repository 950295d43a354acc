"""JSONL shard export (operators/export.py): one file per shard, token
budgets honored, manifest consistent, deterministic across re-runs."""

import glob
import json
import os

import pytest

from pyspark.sql import functions as F

from ranger_spark.operators.export import export_jsonl_shards, plan_shards
from ranger_spark.operators.text import normalize_text, token_count
from ranger_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    d = load(spark, SF, "documents")
    return d.select(
        "doc_id", "source", "text",
        token_count(normalize_text(F.col("text"))).alias("n_tokens"),
    )


def test_plan_shards_budget_and_determinism(docs):
    sharded = plan_shards(docs, budget_tokens=100).collect()
    by_shard: dict = {}
    for r in sharded:
        by_shard.setdefault((r["source"], r["shard_id"]), []).append(r)
    max_doc = max(r["n_tokens"] for r in sharded)
    for (_, _), rows in by_shard.items():
        total = sum(r["n_tokens"] for r in rows)
        # greedy packing: a shard exceeds the budget by at most one doc
        assert total < 100 + max_doc
    # deterministic: same assignment on re-run
    again = {
        (r["source"], r["doc_id"]): r["shard_id"]
        for r in plan_shards(docs, budget_tokens=100).collect()
    }
    for r in sharded:
        assert again[(r["source"], r["doc_id"])] == r["shard_id"]


def test_export_jsonl_shards_roundtrip(docs, tmp_path):
    out = str(tmp_path / "export")
    manifest = export_jsonl_shards(docs, out, budget_tokens=200)
    m = {(r["source"], r["shard_id"]): r for r in manifest.collect()}
    assert m, "no shards produced"
    total_docs = 0
    for (src, sid), row in m.items():
        part_dir = os.path.join(out, f"source={src}", f"shard_id={sid}")
        files = [
            p for p in glob.glob(os.path.join(part_dir, "*"))
            if not os.path.basename(p).startswith((".", "_"))
        ]
        assert len(files) == 1, f"shard {src}/{sid} not a single file"
        lines = [json.loads(ln) for ln in open(files[0])]
        assert len(lines) == row["n_docs"]
        ids = [ln["doc_id"] for ln in lines]
        assert ids == sorted(ids)  # stable order inside the shard
        assert min(ids) == row["first_doc"] and max(ids) == row["last_doc"]
        total_docs += len(lines)
    assert total_docs == docs.count()
    # manifest file mirrors the returned DataFrame
    man_lines = [
        json.loads(ln) for ln in open(os.path.join(out, "_manifest.jsonl"))
    ]
    assert len(man_lines) == len(m)
    for ln in man_lines:
        row = m[(ln["source"], ln["shard_id"])]
        assert ln["n_docs"] == row["n_docs"]
        assert ln["shard_tokens"] == row["shard_tokens"]
