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
# round start (hash_match-only certification since r9). Round 14 front
# (VERDICT r13 next-round #1): the ONE never-certified entry leads —
# stream_corpus_gate (new this round, VERDICT r13 #5: the full ingest
# door as one stream — blocklist → URL dedup vs the ingested catalog →
# token gate → near-dup fingerprint dedup; map-only + broadcast gates,
# one dedup state store) — then the five queries this round CHANGED,
# which must re-certify the same round: q14_promo_share (the 4dp share
# is now computed entirely in integers, q1's idiom — ADVICE r13 #1),
# corpus_dedup_cascade and warc_corpus_pipeline_report (the LSH
# identity gate now measures Jaccard on the distinct HASH set, matching
# the fingerprint/oracle definition — ADVICE r13 #3; the WARC crawl
# cache is also content-keyed now — ADVICE r13 #2),
# warc_source_roundtrip and warc_html_extract_roundtrip (content-keyed
# caches, same ADVICE item). Then the five NAMED r8 deferrals owed from
# r13 (orders_price_histogram, orders_running_backlog,
# parts_pareto_skyline, recs_item_item_cf, retrieval_rrf_fusion), then
# the r9 cohort stalest-first — leading with its two members that also
# CHANGED this round: q3_shipping_priority (gained the conf-gated
# pre-joined-projection deployment path, default plan unchanged) and
# dedup_minhash_lsh (verify step gained the hash-set size mode, default
# off — certified string-count definition untouched). The r9 cohort is
# 49 entries and only 37 slots remain after the leads, so its last TEN
# alphabetically (sample_neyman_allocation, scalar_functions,
# scalar_subquery, text_bm25_scores, text_rake_keywords,
# union_all_tagged, union_distinct, users_bot_heuristic,
# users_kaplan_meier, window_lead_lag) are deferred to the r15 front —
# stated here so the ledger claim stays honest. Max staleness after
# this round: r9 (exactly those ten entries).

_FRONT_R14 = (
    "stream_corpus_gate",
    "q14_promo_share",
    "corpus_dedup_cascade",
    "warc_corpus_pipeline_report",
    "warc_source_roundtrip",
    "warc_html_extract_roundtrip",
    "orders_price_histogram",
    "orders_running_backlog",
    "parts_pareto_skyline",
    "recs_item_item_cf",
    "retrieval_rrf_fusion",
    "q3_shipping_priority",
    "dedup_minhash_lsh",
    "agg_minmax_countd",
    "ann_cosine_topk",
    "array_ops_embeddings",
    "asof_purchase_view",
    "case_when_buckets",
    "cast_ops",
    "comma_join_sql",
    "cube_status_priority",
    "date_extract",
    "distinct_proj",
    "events_daily_unique",
    "events_sequence_chi2",
    "events_sessionization",
    "except_nations",
    "exists_subquery",
    "filter_between",
    "filter_in_list",
    "filter_like",
    "forecast_holt_linear",
    "group_having",
    "in_subquery",
    "intersect_nations",
    "json_extract_props",
    "listagg_types_per_brand",
    "multimodal_jpeg_pixel_stats",
    "nations_revenue_hhi",
    "not_exists_anti",
    "null_handling",
    "order_limit_offset",
    "orders_revenue_peaks",
    "orders_seasonality_decompose",
    "parts_abc_classification",
    "proj_arith_alias",
    "proj_star_small",
    "q5_region_revenue",
    "range_join_error_purchase",
    "sample_dsir_scores",
)


def _ordered():
    reg = load_all()
    front = [n for n in _FRONT_R14 if n in reg]
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
