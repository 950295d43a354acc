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
# certification at the front each round. Round 5 certified the 50
# r1/r3-stale queries (CORRECTNESS_r05); round 6 rotates in: (a) the 22
# round-5 additions that have never been driver-certified, (b) q16/q22
# (last certified round 3, overflowed the 50-window twice) and the
# rows-only stub, (c) any queries new in round 6, then (d) the oldest
# r4-certified queries to fill the window. The r5-certified set goes to
# the back (freshest evidence).
_NEVER_CERTIFIED = (
    # new in round 5 — no driver record yet; highest evidentiary value
    "multimodal_png_pixel_stats",
    "dedup_incremental",
    "doc_chunk_sliding",
    "cross_doc_ngram_dup",
    "pii_redact",
    "json_extract_events",
    "dedup_span_removal",
    "approx_sketches",
    "sample_reservoir_per_source",
    "sample_quality_weighted",
    "multimodal_jpeg_pixel_stats",
    "text_bigram_lm_score",
    "bpe_vocab_merges",
    "text_feature_hash_vector",
    "ann_text_topk",
    "dedup_span_incremental",
    "events_anomaly_zscore",
    "multimodal_mp4_metadata",
    "events_funnel",
    "events_cohort_retention",
    "events_rolling_wau",
    "datetime_functions",
    # last certified round 3; twice overflowed the window tail
    "q16_supplier_count", "q22_idle_balances",
    # rows-only by design (library-gated decode stub)
    "multimodal_decode_stub",
)

_NEW_R6 = (
    # new in round 6 — never driver-certified, certify immediately
    "events_rolling_wau_sketch",
    "bucketed_star_join_sql",
    "text_gopher_rules",
    "dedup_semantic",
    "ann_quantized_topk",
    "corpus_report",
    "source_mixture_plan",
    "multimodal_decode_tiff",
    "events_heavy_hitters",
)

_STALE_R4 = (
    # last driver-certified round 4 (CORRECTNESS_r04) — oldest first;
    # ~23 of these fit in the window behind the blocks above
    "ann_ivf_topk", "ann_ivf_kmeans_topk", "multimodal_decode_gif",
    "multimodal_decode_bmp", "multimodal_decode_jpeg",
    "multimodal_bmp_pixel_stats", "multimodal_gif_frame_count",
    "text_bigram_pmi", "text_length_histogram", "source_quality_report",
    "contamination_fuzzy", "dedup_cluster_assign", "quality_filter_verdict",
    "multimodal_wav_audio_stats", "embedding_quantize_int8",
    "events_hourly_rollup", "events_sessionization", "events_daily_unique",
    "window_lead_lag", "asof_purchase_view", "range_join_error_purchase",
    "null_handling", "json_extract_props", "agg_minmax_countd",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "proj_arith_alias", "filter_between", "filter_in_list", "filter_like",
    "in_subquery", "exists_subquery", "not_exists_anti", "scalar_subquery",
    "group_having", "distinct_proj", "order_limit_offset",
    "union_all_tagged", "union_distinct", "case_when_buckets", "cast_ops",
    "scalar_functions", "comma_join_sql", "date_extract", "proj_star_small",
    "intersect_nations", "except_nations", "cube_status_priority",
    "listagg_types_per_brand",
)


def _ordered():
    reg = load_all()
    front: list[str] = []
    for block in (_NEVER_CERTIFIED, _NEW_R6, _STALE_R4):
        front.extend(n for n in block if n in reg and n not in front)
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
