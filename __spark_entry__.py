"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator registry of
``ranger_spark.queries`` (SURVEY.md §2 inventory + LLM-pipeline
extensions), each paired with a DuckDB-runnable ANSI-SQL oracle where the
semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ranger_spark.queries import load_all  # noqa: E402

# The driver's correctness gate checks the first ~50 registry entries per
# round. Rotation policy: put the queries with the STALEST (or no) driver
# certification at the front each round — computed from the full
# CORRECTNESS_r* ledger by `python tools/cert_ledger.py --front 120` at
# round start (hash_match-only certification since r9). Round 11 front
# (VERDICT r10 next-round #2): the 6 never-certified new entries lead
# (html_extract_text, url_canonical_dedup + the two TWS drains), then the two
# still-r5 window queries cert_ledger showed NOTES' r10 bookkeeping
# missed (window_topn_per_group, window_value_family), then the r6
# cohort stalest-first. The r6 cohort is 47 entries and the window is
# ~50, so its last five (text_bigram_lm_score, text_bigram_pmi,
# text_gopher_rules, text_length_histogram, source_quality_report)
# are deferred to the r12 front — stated here so the ledger claim
# stays honest. Moving-window arithmetic: with 247 queries and a
# ~50-slot window, entries certified 2+ rounds ago always number
# >= 247 - 2*50 = 147 — the structural floor; the real drain metric
# is max-staleness (r5 clears this round; r6 all but five).
_FRONT_R11 = (
    "html_extract_text",
    "stream_tws_topk_seeded",
    "stream_tws_rolling_total",
    "url_canonical_dedup",
    "stream_tws_session_flush",
    "warc_html_extract_roundtrip",
    "window_topn_per_group",
    "window_value_family",
    "ann_ivf_kmeans_topk",
    "ann_ivf_topk",
    "ann_quantized_topk",
    "ann_text_topk",
    "approx_sketches",
    "bpe_vocab_merges",
    "bucketed_star_join_sql",
    "contamination_fuzzy",
    "corpus_report",
    "cross_doc_ngram_dup",
    "datetime_functions",
    "dedup_cluster_assign",
    "dedup_incremental",
    "dedup_semantic",
    "dedup_span_incremental",
    "dedup_span_removal",
    "doc_chunk_sliding",
    "embedding_quantize_int8",
    "events_anomaly_zscore",
    "events_cohort_retention",
    "events_funnel",
    "events_heavy_hitters",
    "events_hourly_rollup",
    "events_rolling_wau",
    "events_rolling_wau_sketch",
    "json_extract_events",
    "multimodal_bmp_pixel_stats",
    "multimodal_decode_bmp",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "multimodal_decode_tiff",
    "multimodal_gif_frame_count",
    "multimodal_mp4_metadata",
    "multimodal_png_pixel_stats",
    "multimodal_wav_audio_stats",
    "pii_redact",
    "q16_supplier_count",
    "q22_idle_balances",
    "quality_filter_verdict",
    "sample_quality_weighted",
    "sample_reservoir_per_source",
    "source_mixture_plan",
)


def _ordered():
    reg = load_all()
    front = [n for n in _FRONT_R11 if n in reg]
    rest = [n for n in reg if n not in front]
    return {n: reg[n] for n in front + rest}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing-summary aggregation pipeline) on sf0.001."""
    registry = load_all()
    return registry["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracles (DuckDB) for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }
