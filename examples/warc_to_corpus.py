"""End-to-end web-corpus pipeline in PRODUCTION stage order: WARC crawl
→ domain blocklist → URL-level dedup → main-content extraction →
language-routed quality gate → near-dedup → packed training sequences.

This is the chain a 100-TB Common-Crawl-style ingest runs, expressed
entirely in DataFrame ops so every stage scales by partitioning —
cheapest filters first, so expensive stages see the fewest bytes:

  1. `spark.read.format("warc")` — one input partition per .warc.gz
     file (per-record gzip is not splittable; ~1 GB crawl files make
     file granularity the natural parallelism unit), rec_type /
     http_status pushdown inside the record walk;
  2. domain blocklist — canonicalize the URL, extract the host,
     broadcast-join the blocklist dim (drops whole domains before ANY
     content work);
  3. URL-level dedup — mirrors/re-crawls of the same canonical URL
     collapse on a 16-byte digest shuffle (operators/urls.py);
  4. `html_main_content` — C4-style boilerplate removal as pure JVM
     column expressions: map-only, zero shuffles, zero Python;
  5. language-routed quality gate — stopword-vote lang_id on the
     extracted text feeding per-language Gopher thresholds
     (operators/text.routed_quality_gate), still map-only;
  6. MinHash+LSH near-dedup — the only other shuffles in the pipeline,
     banded so candidate pairs never go all-pairs;
  7. sequence packing for training.

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
from ranger_spark.operators.text import (  # noqa: E402
    lang_id,
    normalize_text,
    routed_quality_gate,
    tokenize,
)
from ranger_spark.operators.urls import canonicalize_url  # noqa: E402
from ranger_spark.session import get_spark  # noqa: E402
from ranger_spark.sources.warc_datasource import register_warc_source  # noqa: E402


def build_synthetic_crawl(spark, out: str, n: int = 200) -> None:
    """A tiny stand-in crawl: HTML response records with nav/script
    chrome around distinct bodies (plus a few near-duplicates). Pages
    spread over hosts ex0-ex6.com (ex3.com is blocklisted downstream),
    and every 5th page also appears as a MIRROR — same canonical URL
    modulo scheme/www/tracking params — that URL dedup must drop."""
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
    host = F.concat(F.lit("ex"), (F.col("id") % 7).cast("string"), F.lit(".com"))
    base_url = F.concat(
        F.lit("http://"), host, F.lit("/"), F.col("id").cast("string")
    )
    mirror_url = F.concat(
        F.lit("HTTPS://www."), host, F.lit("/"), F.col("id").cast("string"),
        F.lit("?utm_source=mirror#top"),
    )
    rows = spark.range(n).select(
        F.col("id"),
        F.explode(
            F.when(
                F.col("id") % 5 == 0, F.array(base_url, mirror_url)
            ).otherwise(F.array(base_url))
        ).alias("target_uri"),
        body.alias("body"),
    )
    (
        rows.select(
            F.lit("response").alias("rec_type"),
            F.concat(
                F.lit("<urn:ex:"), F.md5("target_uri"), F.lit(">")
            ).alias("record_id"),
            "target_uri",
            F.lit("2024-01-01T00:00:00Z").alias("warc_date"),
            F.encode(F.col("body"), "utf-8").alias("payload"),
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

    # 1. read (status pushdown reaches the record walk)
    pages = (
        spark.read.format("warc")
        .option("strip_http_headers", "true")
        .load(landing)
        .filter((F.col("rec_type") == "response") & (F.col("http_status") == 200))
        .select(F.col("target_uri").alias("url"), "payload")
    )
    n_crawl = pages.count()

    # 2. domain blocklist — the cheapest filter runs FIRST: canonical
    # host against a broadcast blocklist dim, before any content work
    canon = canonicalize_url(F.col("url"))
    pages = pages.select(
        "url", "payload", canon.alias("canonical_url"),
        F.regexp_extract(canon, r"^[a-z]+://([^/]+)", 1).alias("host"),
    )
    blocklist = spark.createDataFrame([("ex3.com",)], ["host"]).withColumn(
        "__blocked", F.lit(True)
    )
    pages = (
        pages.join(F.broadcast(blocklist), "host", "left")
        .filter(F.col("__blocked").isNull())
        .drop("__blocked")
    )
    n_unblocked = pages.count()

    # 3. URL-level dedup — mirrors collapse on the canonical digest
    # (16-byte shuffle key); keeper = lexicographic min url
    keep = (
        pages.groupBy(F.md5("canonical_url").alias("url_fp"))
        .agg(F.min("url").alias("url"))
        .select("url")
    )
    pages = pages.join(keep, "url", "left_semi")
    n_url_deduped = pages.count()

    # 4. extract (map-only, zero Python)
    docs = pages.select(
        "url",
        html_main_content(F.decode(F.col("payload"), "utf-8")).alias("text"),
    ).filter(F.length("text") > 0)

    # 5. language-routed quality gate: lang_id on the EXTRACTED text
    # feeds per-language thresholds (detection-first; metadata fallback
    # would slot in here if the crawl carried a language hint)
    routed = lang_id(tokenize(normalize_text(F.col("text"))))
    docs = docs.select("url", "text", routed.alias("routed_lang"))
    docs = docs.select(
        "url", "text", "routed_lang",
        F.split(F.trim("text"), r"\s+").alias("__wt"),
        F.split(F.trim(F.lower("text")), r"\s+").alias("__lt"),
    )
    gates = {
        # demo thresholds scaled to the synthetic bodies (~20 words);
        # production uses DEFAULT_LANG_GATES
        "en": {"min_units": 5, "min_alpha_frac": 0.5, "min_stop_hits": 0},
        "und": {"min_units": 8, "min_alpha_frac": 0.5, "min_stop_hits": 0},
    }
    g = routed_quality_gate(
        F.col("text"), F.col("routed_lang"), gates=gates,
        toks=F.col("__wt"), ltoks=F.col("__lt"),
    )
    kept = (
        docs.select(
            "url", "text",
            g["n_units"].alias("n_tokens"),
            g["passes"].alias("passes"),
        )
        .filter("passes")
        .drop("passes")
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
    print(f"crawl records (incl. mirrors):    {n_crawl}")
    print(f"after domain blocklist:           {n_unblocked}")
    print(f"after URL-level dedup:            {n_url_deduped}")
    print(f"extracted non-empty documents:    {n_in}")
    print(f"survived language-routed gate:    {n_q}")
    print(f"verified near-dup pairs:          {n_pairs}")
    print(f"survived near-dedup:              {n_out}")
    print(f"packed training sequences:        {n_seq}")
    deduped.select("doc_id", "text").show(5, truncate=70)
    spark.stop()


if __name__ == "__main__":
    main()
