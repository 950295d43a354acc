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
# CORRECTNESS_r* ledger by `python tools/cert_ledger.py --front 50` at
# round start and pasted here verbatim. Round 7 front: the r6 harness
# casualty (text_feature_hash_vector, now reshaped to scalar columns),
# the rows-only stub, then the 34 r4-stale queries oldest-first, then the
# oldest r5-certified queries to fill the window.
_FRONT_R7 = (
    "multimodal_decode_stub",
    "text_feature_hash_vector",
    # new in round 7 — never driver-certified, certify immediately
    "grouping_sets_revenue",
    "pivot_status_by_priority",
    "unpivot_pricing_metrics",
    "recursive_year_spine",
    "dedup_canonical_pick",
    "sample_temperature_mixture",
    "export_shard_plan",
    "events_gap_fill_interpolate",
    "events_markov_transitions",
    "multimodal_warc_records",
    "orders_price_histogram",
    "embedding_label_centroids",
    "cross_source_containment",
    "boilerplate_line_removal",
    "ccnet_entropy_buckets",
    "source_pagerank",
    "stream_windowed_daily",
    "dedup_bloom_prefilter",
    "sample_dsir_scores",
    "embedding_covariance",
    "stream_session_windows",
    "events_ewma_daily",
    "pq_codes",
    "embedding_pca_projection",
    "ann_pq_topk",
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
)


def _ordered():
    reg = load_all()
    front = [n for n in _FRONT_R7 if n in reg]
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
