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
# round start (hash_match-only certification since r9). Round 9 front:
# the 7 uncertified queries lead (3 r8 hash failures, now fixed +
# re-verified at three SFs, then the 4 never-driver-tested), followed by
# the four queries whose code/oracle changed this round
# (events_sequence_chi2, orders_revenue_peaks, sample_dsir_scores,
# dedup_minhash_lsh — certified green only on PRE-change code), then
# stalest-first (r4, r5, ...). New-query development stays FROZEN until
# §2-core staleness <= 1 round (VERDICT r8 item 2).
_FRONT_R9 = (
    "forecast_holt_linear",
    "orders_seasonality_decompose",
    "parts_abc_classification",
    "sample_neyman_allocation",
    "text_rake_keywords",
    "users_bot_heuristic",
    "users_kaplan_meier",
    "events_sequence_chi2",
    "orders_revenue_peaks",
    "sample_dsir_scores",
    "dedup_minhash_lsh",
    "nations_revenue_hhi",
    "text_bm25_scores",
    "multimodal_jpeg_pixel_stats",
    "agg_minmax_countd",
    "asof_purchase_view",
    "case_when_buckets",
    "cast_ops",
    "comma_join_sql",
    "cube_status_priority",
    "date_extract",
    "distinct_proj",
    "events_daily_unique",
    "events_sessionization",
    "except_nations",
    "exists_subquery",
    "filter_between",
    "filter_in_list",
    "filter_like",
    "group_having",
    "in_subquery",
    "intersect_nations",
    "json_extract_props",
    "listagg_types_per_brand",
    "not_exists_anti",
    "null_handling",
    "order_limit_offset",
    "proj_arith_alias",
    "proj_star_small",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "range_join_error_purchase",
    "scalar_functions",
    "scalar_subquery",
    "union_all_tagged",
    "union_distinct",
    "window_lead_lag",
    "ann_cosine_topk",
    "array_ops_embeddings",
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
)


def _ordered():
    reg = load_all()
    front = [n for n in _FRONT_R9 if n in reg]
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
