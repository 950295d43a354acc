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
# round start and pasted here verbatim. Round 8 front: the 54 queries no
# driver round has ever certified lead (alphabetical; the non-oracled
# multimodal_decode_stub was retired this round so every name below is
# hash-checkable), followed by the r4-stale then r5-stale queries so a
# wider window re-certifies the oldest entries first. New-query
# development is FROZEN until this backlog drains (VERDICT r7 item 1).
_FRONT_R8 = (
    "ann_mmr_rerank",
    "ann_truncated_dim_recall",
    "approx_percentile_check",
    "cohort_ltv_curve",
    "conformal_price_interval",
    "copurchase_bfs_hops",
    "copurchase_kcore",
    "copurchase_triangles",
    "curriculum_phase_plan",
    "customer_gini_revenue",
    "customer_order_interarrival",
    "customer_pareto_share",
    "customer_rfm_scores",
    "customers_k_anonymity",
    "dedup_edit_distance",
    "dedup_threshold_sweep",
    "embedding_outlier_knn",
    "events_anomaly_mad",
    "events_attribution_credit",
    "events_cuped_adjustment",
    "events_dau_mau_stickiness",
    "events_ewma_daily",
    "events_kmv_set_ops",
    "events_lateness_profile",
    "events_markov_stationary",
    "events_path_trigrams",
    "events_pattern_match",
    "events_power_analysis",
    "events_psi_drift",
    "events_sequence_chi2",
    "events_welch_ttest",
    "forecast_holt_linear",
    "forecast_seasonal_naive",
    "graph_label_propagation",
    "lineitem_weighted_median_price",
    "multimodal_image_entropy",
    "multimodal_wav_silence",
    "nations_revenue_hhi",
    "nb_lang_classifier",
    "orders_ar1_autoregression",
    "orders_benford_audit",
    "orders_cusum_changepoint",
    "orders_price_histogram",
    "orders_revenue_peaks",
    "orders_running_backlog",
    "orders_seasonality_decompose",
    "parts_abc_classification",
    "parts_pareto_skyline",
    "recs_item_item_cf",
    "retrieval_rrf_fusion",
    "sample_neyman_allocation",
    "text_rake_keywords",
    "users_bot_heuristic",
    "users_kaplan_meier",
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
    "dedup_minhash_lsh",
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
)


def _ordered():
    reg = load_all()
    front = [n for n in _FRONT_R8 if n in reg]
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
