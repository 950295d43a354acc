"""End-to-end web-corpus pipeline: WARC crawl → main-content extraction
→ quality filter → near-dedup → packed training sequences.

This is the chain a 100-TB Common-Crawl-style ingest runs, expressed
entirely in DataFrame ops so every stage scales by partitioning:

  1. `spark.read.format("warc")` — one input partition per .warc.gz
     file (per-record gzip is not splittable; ~1 GB crawl files make
     file granularity the natural parallelism unit), rec_type /
     http_status pushdown inside the record walk;
  2. `html_main_content` — C4-style boilerplate removal as pure JVM
     column expressions: map-only, zero shuffles, zero Python;
  3. quality gate — Gopher/C4 signal thresholds, still map-only;
  4. MinHash+LSH near-dedup — the only shuffles in the pipeline, banded
     so candidate pairs never go all-pairs;
  5. sequence packing for training.

Run: python examples/warc_to_corpus.py [landing_zone_dir]
(builds a small synthetic crawl under /tmp when no dir is given).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ranger_spark.operators.dedup import minhash_lsh_dedup  # noqa: E402
from ranger_spark.operators.html_extract import html_main_content  # noqa: E402
from ranger_spark.operators.text import quality_metrics, tokenize  # noqa: E402
from ranger_spark.session import get_spark  # noqa: E402
from ranger_spark.sources.warc_datasource import register_warc_source  # noqa: E402


def build_synthetic_crawl(spark, out: str, n: int = 200) -> None:
    """A tiny stand-in crawl: HTML response records with nav/script
    chrome around distinct bodies (plus a few near-duplicates)."""
    # ~10% of pages reuse a neighbour's body plus a short trailer →
    # genuine NEAR-duplicates (high but sub-1.0 Jaccard); everything
    # else gets hash-derived tokens, so distinct docs share ~no shingles
    is_dup = (F.col("id") % 10 == 9).cast("long")
    seed = (F.col("id") - is_dup).cast("string")
    words = F.regexp_replace(F.md5(seed), "(..)", "$1 ")
    body = F.concat(
        F.lit(
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            "<html><head><title>page</title><script>t()</script></head>"
            "<body><nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
            "<p>Crawled document body "
        ),
        words,
        F.when(is_dup == 1, F.lit("with a near duplicate trailer "))
        .otherwise(F.lit("")),
        F.lit(
            "ends here.</p><p>Click here</p></body></html>"
        ),
    )
    (
        spark.range(n)
        .select(
            F.lit("response").alias("rec_type"),
            F.concat(F.lit("<urn:ex:"), F.col("id").cast("string"), F.lit(">")).alias(
                "record_id"
            ),
            F.concat(F.lit("http://ex.com/"), F.col("id").cast("string")).alias(
                "target_uri"
            ),
            F.lit("2024-01-01T00:00:00Z").alias("warc_date"),
            F.encode(body, "utf-8").alias("payload"),
        )
        .repartition(4)
        .write.format("warc")
        .mode("append")
        .save(out)
    )


def main() -> None:
    spark = get_spark("warc_to_corpus")
    register_warc_source(spark)
    if len(sys.argv) > 1:
        landing = sys.argv[1]
    else:
        landing = tempfile.mkdtemp(prefix="crawl_")
        build_synthetic_crawl(spark, landing)

    # 1-2. read + extract (status pushdown reaches the record walk)
    docs = (
        spark.read.format("warc")
        .option("strip_http_headers", "true")
        .load(landing)
        .filter((F.col("rec_type") == "response") & (F.col("http_status") == 200))
        .select(
            F.col("target_uri").alias("url"),
            html_main_content(F.decode(F.col("payload"), "utf-8")).alias("text"),
        )
        .filter(F.length("text") > 0)
    )

    # 3. quality gate (map-only; thresholds are the C4/Gopher shape)
    toks = tokenize(F.col("text"))
    q = quality_metrics(F.col("text"), toks=toks)
    scored = docs.select("url", "text", *(v.alias(k) for k, v in q.items()))
    kept = scored.filter(
        (F.col("n_tokens") >= 5)
        & (F.col("mean_word_len").between(2, 12))
        & (F.col("punct_ratio") < 0.3)
    )

    # 4. near-dedup (banded LSH — the pipeline's only shuffles):
    # exact dups collapse inside the operator; verified near-dup PAIRS
    # come back, and we drop the greater member of each pair
    with_ids = kept.withColumn("doc_id", F.abs(F.hash("url")).cast("long"))
    pairs = minhash_lsh_dedup(
        with_ids,
        id_col="doc_id",
        text_col="text",
        num_hashes=16,
        bands=8,
        threshold=0.5,
    )
    drop = pairs.select(
        F.greatest("id_a", "id_b").alias("doc_id")
    ).distinct()
    deduped = with_ids.join(F.broadcast(drop), "doc_id", "left_anti")

    # 5. pack survivors into fixed-size training sequences
    from ranger_spark.operators.sampling import pack_sequences

    packed = pack_sequences(
        deduped.select("doc_id", F.col("n_tokens")),
        "doc_id",
        "n_tokens",
        budget=64,
    ).filter(F.col("seq_id") >= 0)

    n_in = docs.count()
    n_q = kept.count()
    n_pairs = pairs.count()
    n_out = deduped.count()
    n_seq = packed.select("seq_id").distinct().count()
    print(f"crawl records kept by extraction: {n_in}")
    print(f"survived quality gate:            {n_q}")
    print(f"verified near-dup pairs:          {n_pairs}")
    print(f"survived near-dedup:              {n_out}")
    print(f"packed training sequences:        {n_seq}")
    deduped.select("doc_id", "text").show(5, truncate=70)
    spark.stop()


if __name__ == "__main__":
    main()
