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
# round start (hash_match-only certification since r9). Round 12 front
# (VERDICT r11 next-round #3 + #8): the three never-certified new
# entries lead (corpus_language_routed — the html_extract → lang_id →
# per-language Gopher gate routing; url_host_blocklist — the broadcast
# domain-blocklist filter; corpus_dedup_cascade — per-stage dedup
# survival accounting), then the five r6 deferrals NAMED in the r11
# front comment (source_quality_report, text_bigram_lm_score,
# text_bigram_pmi, text_gopher_rules, text_length_histogram), then the
# r7 cohort stalest-first. orders_ar1_autoregression is in the window
# out of staleness order because the round CHANGED its protocol (exact
# integer-cents monthly sums + 2dp intercept after the repeated-sf0.1
# sweeps caught a rounding-boundary flap) — changed queries re-certify
# the same round; conformal_price_interval likewise (same flap class,
# fixed proactively + a round_lint rule). The r7 cohort is 48 entries and the window is ~50,
# so its last seven (text_inverted_index, text_lang_confusion,
# text_ngram_novelty, text_oov_rate, text_script_profile,
# text_zipf_fit, unpivot_pricing_metrics) are deferred to the r13
# front — stated here so the ledger claim stays honest (joined by
# text_feature_hash_vector, displaced when conformal_price_interval's
# coefficients were re-gridded to cents and had to re-certify). Max
# staleness after this round: r7 (exactly those eight entries), r8
# after r13.

_FRONT_R12 = (
    "corpus_language_routed",
    "url_host_blocklist",
    "corpus_dedup_cascade",
    "orders_ar1_autoregression",
    "conformal_price_interval",
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
    "multimodal_warc_records",
    "pivot_status_by_priority",
    "pq_codes",
    "quality_classifier_logreg",
    "range_partition_bounds",
    "recursive_year_spine",
    "sample_kcenter_coreset",
    "sample_temperature_mixture",
    "skew_key_diagnosis",
    "source_pagerank",
    "stream_dedup_keys",
    "stream_merge_upsert_rollup",
    "stream_session_windows",
    "stream_stateful_user_stats",
    "stream_stream_join",
    "stream_windowed_daily",
    "table_profile",
)


def _ordered():
    reg = load_all()
    front = [n for n in _FRONT_R12 if n in reg]
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
