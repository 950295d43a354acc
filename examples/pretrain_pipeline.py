"""End-to-end training-data pipeline: the composition a 100 TB corpus
actually runs, stage by stage, each one an operator certified by the
oracle gate.

    ingest → exact dedup → near-dup (MinHash LSH) → duplicated-span
    removal → quality filters (heuristics + bigram-LM perplexity) →
    PII redaction → quality-weighted sampling → contamination check →
    chunking → sequence packing → train/val/test split

    python examples/pretrain_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ranger_spark.operators.chunking import chunk_sliding, remove_dup_spans
from ranger_spark.operators.dedup import exact_dedup_keep, minhash_lsh_dedup
from ranger_spark.operators.sampling import (
    contamination_check,
    hash_split,
    pack_sequences,
    weighted_sample,
)
from ranger_spark.operators.text import (
    bigram_lm_score,
    gopher_metrics,
    quality_metrics,
    tokenize,
)
from ranger_spark.session import get_spark
from ranger_spark.tables import load

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("pretrain_pipeline", cpus=8)

    # 0. ingest from the crawl container: pack the corpus into gzip'd
    #    WARC shards once (the layout a real crawl lands in), then read
    #    them back through the first-class `warc` source — rec_type
    #    pushdown, per-file partitions, Arrow batches
    #    (sources/warc_datasource.py)
    import tempfile

    from pyspark.sql import functions as _F

    landing = tempfile.mkdtemp(prefix="pretrain_warc_")
    (
        load(spark, SF, "documents")
        .select(
            _F.lit("resource").alias("rec_type"),
            _F.concat(_F.lit("<urn:doc:"), "doc_id", _F.lit(">")).alias("record_id"),
            _F.concat(_F.lit("doc://"), "doc_id").alias("target_uri"),
            _F.lit("").alias("warc_date"),
            _F.encode("text", "utf-8").alias("payload"),
        )
        .write.format("warc").mode("append").save(landing)
    )
    docs = (
        spark.read.format("warc").load(landing)
        .filter(_F.col("rec_type") == "resource")
        .select(
            _F.expr("CAST(substring(target_uri, 7) AS BIGINT)").alias("doc_id"),
            _F.decode("payload", "utf-8").alias("text"),
        )
    )
    n0 = docs.count()

    # 1. exact dedup: 16-byte digest shuffle, keep one doc per digest
    docs = exact_dedup_keep(docs, "doc_id", "text")
    n1 = docs.count()

    # 2. near-dup: MinHash+LSH pairs → drop the higher id of each pair
    pairs = minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")
    n2 = docs.count()

    # 3. duplicated-span removal: corpus-duplicated 5-gram windows erased
    spans = remove_dup_spans(docs, "doc_id", "text", n=5)
    docs = docs.join(spans.select("doc_id", "n_removed"), "doc_id")

    # 4. quality: heuristic metrics + bigram-LM perplexity, both map-only
    #    or vocabulary-bounded
    q = quality_metrics(F.col("text"))
    lm = bigram_lm_score(docs, "doc_id", "text")
    g = gopher_metrics(F.col("text"))
    docs = (
        docs.select(
            "doc_id",
            "text",
            *[c.alias(k) for k, c in q.items()],
            # Gopher rule signals ride the same map-only projection; the
            # synthetic docs are shorter than real web pages, so the
            # filter below keeps the signals' sub-verdicts rather than
            # the 50-word floor
            g["alpha_word_frac"].alias("alpha_word_frac"),
            g["symbol_word_ratio"].alias("symbol_word_ratio"),
        )
        .join(lm.select("doc_id", "avg_neg_logp"), "doc_id")
        .filter(
            (F.col("n_tokens") >= 5)
            & (F.col("stopword_ratio") > 0)
            & (F.col("alpha_word_frac") > 0.8)
            & (F.col("symbol_word_ratio") < 0.1)
        )
    )
    n4 = docs.count()

    # 5. PII redaction (map-only JVM regexp)
    email = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    docs = docs.withColumn("text", F.regexp_replace("text", email, "<EMAIL>"))

    # 6. quality-weighted downsample: P(keep) = clamp(n_tokens/60, 0, 1)
    docs = weighted_sample(docs, "doc_id", F.col("n_tokens") / F.lit(60.0))
    n6 = docs.count()

    # 7. contamination check against a held-out "benchmark" slice
    bench = load(spark, SF, "documents").filter("doc_id % 97 = 0")
    leaks = contamination_check(docs, bench, "doc_id", "text").count()

    # 8. chunk → pack → split
    chunks = chunk_sliding(docs, "doc_id", "text", chunk_size=64, overlap=8)
    toks = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).alias("n_tokens")
    )
    packed = pack_sequences(toks, "doc_id", "n_tokens", budget=2048)
    split = hash_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    dist = {r["split"]: r["cnt"] for r in
            split.groupBy("split").agg(F.count("*").alias("cnt")).collect()}

    print(f"ingested {n0} → exact-dedup {n1} → near-dup {n2} → "
          f"quality {n4} → weighted-sample {n6}")
    print(f"benchmark leaks flagged: {leaks}")
    print(f"chunks: {chunks.count()}, packed sequences: "
          f"{packed.select('seq_id').distinct().count()}, split: {dist}")
    spark.stop()


if __name__ == "__main__":
    main()
