"""End-to-end demo: the SQL engine surface + the training-data pipeline.

    python examples/demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ranger_spark.engine import Engine
from ranger_spark.operators import (
    brute_force_topk,
    minhash_lsh_dedup,
    quality_metrics,
)
from ranger_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(
        "ranger_demo",
        cpus=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="demo_wh_")},
    )
    engine = Engine(spark)

    print("== SQL engine (ranger statement surface) ==")
    for stmt in (
        "CREATE DATABASE demo;",
        "USE demo;",
        "CREATE TABLE users (id int32 NOT NULL, name string, "
        "tags list<string>, bal decimal(10,2)) STORAGE filesystem;",
        "INSERT INTO users (id, name, bal) VALUES "
        "(1, 'alice', 10.50), (2, 'bob', 20.25), (3, 'carol', 3.75);",
    ):
        print(f"  {stmt.splitlines()[0][:60]:62s} -> {engine.execute(stmt).message}")
    r = engine.execute("SELECT name, bal FROM users WHERE bal > 5 ORDER BY id;")
    print("  SELECT ...                         ->", r.rows)
    r = engine.execute("CREATE TABLE rich AS SELECT id, name FROM users WHERE bal > 5;")
    print("  CTAS (exceeds reference)           ->", r.message)
    r = engine.execute("INSERT INTO rich SELECT id + 10, upper(name) FROM users;")
    print("  INSERT ... SELECT (exceeds)        ->", r.message)
    print("  SHOW CREATE TABLE users:")
    print("   ", engine.execute("SHOW CREATE TABLE users;").rows[0][0].replace("\n", "\n    "))

    print("\n== Round-7 surface: tags, CDC reads, prepared statements ==")
    r = engine.execute("ALTER TABLE users CREATE TAG launch;")
    print("  CREATE TAG                         ->", r.message)
    engine.execute("INSERT INTO users (id, name, bal) VALUES (4, 'dave', 99.00);")
    r = engine.execute("SELECT count(*) AS n FROM users VERSION AS OF 'launch';")
    print("  SELECT ... VERSION AS OF 'launch'  ->", r.rows, "(pre-insert)")
    r = engine.execute("SELECT name FROM users CHANGES SINCE VERSION 2;")
    print("  CHANGES SINCE VERSION 2            ->", r.rows)
    engine.execute("PREPARE top_bal AS SELECT name FROM users WHERE bal > $1 ORDER BY bal DESC;")
    r = engine.execute("EXECUTE top_bal(15);")
    print("  PREPARE/EXECUTE top_bal(15)        ->", r.rows)
    r = engine.execute("SELECT table_name, version FROM system.snapshots ORDER BY version DESC LIMIT 1;")
    print("  system.snapshots head              ->", r.rows)
    r = engine.execute("SHOW PIPELINES;")
    print("  SHOW PIPELINES                     ->", r.row_count, "registered operators")
    r = engine.execute(f"PIPELINE text_length_histogram USING '{SF}';")
    print("  PIPELINE text_length_histogram     ->", r.rows[:3], "...")

    print("\n== Training-data pipeline (documents/embeddings tables) ==")
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.05)
    print("  near-dup pairs (minhash+LSH, jaccard>=0.05):", pairs.count())
    q = docs.select(
        "doc_id", *[c.alias(n) for n, c in quality_metrics(F.col("text")).items()]
    )
    q.orderBy("doc_id").show(3, truncate=False)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    topk = brute_force_topk(emb.filter(F.col("vec_id") == 0), emb, k=3)
    print("  cosine top-3 for vec 0:")
    topk.show()

    print("== Corpus assembly: sample -> split -> pack ==")
    from ranger_spark.operators.sampling import (
        hash_split,
        pack_sequences,
        stratified_sample,
    )
    from ranger_spark.operators.text import normalize_text, token_count

    sampled = stratified_sample(docs, "doc_id", 0.5)
    split = hash_split(sampled, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    print("  splits:", {r.split: r.n for r in split.groupBy("split")
                        .agg(F.count(F.lit(1)).alias("n")).collect()})
    packed = pack_sequences(
        split.filter(F.col("split") == "train").select(
            "doc_id", "lang",
            token_count(normalize_text(F.col("text"))).cast("long").alias("n_tokens"),
        ),
        "doc_id", "n_tokens", 2048, ["lang"],
    )
    print("  training sequences (2048-token budget):",
          packed.select("lang", "seq_id").distinct().count())
    spark.stop()


if __name__ == "__main__":
    main()
