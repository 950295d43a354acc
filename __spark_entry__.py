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
# round start (hash_match-only certification since r9). Round 10 front:
# the 3 newly-registered media queries lead (FLAC/H.264/MP3 — never
# driver-certified; VERDICT r9 item 4 asked for exactly these), then
# stalest-first (the r5 cohort: outer joins, window families, TPC-H
# likes, simhash/ngram dedup, ...). Note the moving-window arithmetic:
# with 241 queries and a ~50-slot window, entries certified 2+ rounds
# ago always number >= 241 - 2*50 = 141 — that is the structural floor,
# reached when consecutive fronts never overlap (they don't here).
_FRONT_R10 = (
    "multimodal_flac_audio_stats",
    "multimodal_h264_keyframe_sample",
    "multimodal_mp3_stream_meta",
    # registered mid-r10 (transformWithStateInPandas un-gated by the
    # vendored protobuf runtime + the first-class warc data source —
    # NOTES round-10 items 12-14); never driver-certified, so they
    # lead with the other never-certified 3
    "stream_tws_value_histogram",
    "warc_source_roundtrip",
    "contamination_check",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "embedding_similar_pairs",
    "embedding_stats",
    "full_outer_join",
    "left_outer_join",
    "multimodal_decode_png",
    "multimodal_meta",
    "pack_sequences_2k",
    "percentiles_by_group",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_split",
    "q13_count_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    "q20_part_promo_suppliers",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "rollup_status_priority",
    "sample_stratified",
    "text_entropy",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_repetition",
    "text_tokens",
    "tfidf_top_terms",
    "token_frequencies",
    "train_val_test_split",
    "window_range_frame",
    "window_rank_family",
    "window_running_total",
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
    "source_quality_report",
    "text_bigram_lm_score",
    "text_bigram_pmi",
    "text_gopher_rules",
    "text_length_histogram",
    "ann_hard_negatives",
    "ann_ivf_recall_eval",
    "ann_pq_topk",
    "ann_rp_lsh_topk",
    "basket_frequent_pairs",
    "boilerplate_line_removal",
    "ccnet_entropy_buckets",
    "cross_source_containment",
    "dedup_bloom_prefilter",
    "dedup_canonical_pick",
    "dedup_minhash_recall_eval",
    "embedding_covariance",
    "embedding_drift_by_label",
    "embedding_label_centroids",
    "embedding_pca_projection",
    "events_gap_fill_interpolate",
    "events_markov_backtest",
    "events_markov_transitions",
    "events_salted_hot_key_agg",
    "export_shard_plan",
    "grouping_sets_revenue",
    "knn_label_accuracy",
    "multimodal_image_ahash_dedup",
)


def _ordered():
    reg = load_all()
    front = [n for n in _FRONT_R10 if n in reg]
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
