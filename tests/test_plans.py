"""Plan-quality regression tests: assert Catalyst keeps doing what the
100 TB design depends on — pushdown, pruning, broadcast of fixed-size
dims, bounded shuffle counts."""

from __future__ import annotations

from ranger_spark.plans.inspect import (
    join_strategies,
    num_exchanges,
    pushed_filters,
    read_schemas,
)
from ranger_spark.queries import load_all
from tests.conftest import SF_DIR


def test_q1_filter_reaches_scan(spark):
    df = load_all()["q1_pricing_summary"].builder(spark, SF_DIR)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f and "LessThanOrEqual" in f for f in pf), pf


def test_q1_column_pruning(spark):
    df = load_all()["q1_pricing_summary"].builder(spark, SF_DIR)
    (schema,) = read_schemas(df)
    # only the 7 needed columns are read, not all 11
    assert schema.count(":") == 7 and "l_orderkey" not in schema, schema


def test_q5_broadcasts_fixed_dims(spark):
    df = load_all()["q5_region_revenue"].builder(spark, SF_DIR)
    js = join_strategies(df)
    assert js["BroadcastHashJoin"] >= 2, js
    assert js["CartesianProduct"] == 0 and js["BroadcastNestedLoopJoin"] == 0, js


def test_q1_single_shuffle(spark):
    df = load_all()["q1_pricing_summary"].builder(spark, SF_DIR)
    # partial agg → one exchange → final agg
    assert num_exchanges(df) == 1


def test_semi_join_for_in_subquery(spark):
    df = load_all()["in_subquery"].builder(spark, SF_DIR)
    plan = str(df._jdf.queryExecution().executedPlan())
    assert "LeftSemi" in plan


def test_scalar_subquery_no_cartesian_blowup(spark):
    df = load_all()["scalar_subquery"].builder(spark, SF_DIR)
    js = join_strategies(df)
    # 1-row aggregate side → broadcast nested loop is fine; a shuffled
    # cartesian over the full table is not
    assert js["CartesianProduct"] == 0, js


# Queries where a BroadcastNestedLoopJoin is the intended plan (inequality
# join against a deliberately tiny broadcast side).
_NL_ALLOWED = {
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "scalar_subquery",
    "q22_idle_balances",
    "q11_important_parts",  # val > (1-row broadcast global-sum threshold)
    "tfidf_top_terms",  # idf needs N = 1-row broadcast corpus count
    "text_bigram_pmi",  # PMI needs the 1-row broadcast unigram/bigram totals
    "text_bigram_lm_score",  # 1-row broadcast vocab size
    "ann_text_topk",  # 3-row broadcast query side of the != pair join
    "events_funnel",  # 1-row stage-count broadcasts (crossJoin of scalars)
    "sample_dsir_scores",  # 1-row broadcast token totals (crossJoin of scalars)
    "ann_pq_topk",  # |Q|-row broadcast LUT crossJoin over the codes table
    # session-4 family: every entry below is a crossJoin of a 1-row (or
    # k-bounded) broadcast aggregate — corpus stats, thresholds, per-round
    # trace counts — never a data-sized pair join:
    "events_welch_ttest",  # 1-row arm-stats crossJoin
    "orders_benford_audit",  # 1-row total crossJoin
    "users_kaplan_meier",  # 1-row horizon broadcast
    "orders_cusum_changepoint",  # 1-row mean broadcast
    "events_cuped_adjustment",  # 1-row midpoint + theta broadcasts
    "parts_abc_classification",  # 1-row total crossJoin
    "copurchase_triangles",  # 1-row stats×edges×tri count crossJoins
    "copurchase_kcore",  # per-round 1-row node/edge count crossJoins
    "copurchase_bfs_hops",  # per-hop 1-row frontier/seen count crossJoins
    "nb_lang_classifier",  # |langs|-row broadcast likelihood-table crossJoin
    "retrieval_rrf_fusion",  # 3-row broadcast query sides (dense + lexical)
    "ann_truncated_dim_recall",  # 8-row broadcast query sides (both kernels)
    "events_kmv_set_ops",  # 1-row exact-total broadcasts
    "orders_ar1_autoregression",  # (none today; series-stat crossJoins ok)
    "nations_revenue_hhi",  # 1-row nation-total broadcast
    "sample_neyman_allocation",  # 1-row weight-sum crossJoin
    "conformal_price_interval",  # 1-row fit/q-hat/coverage crossJoins
    "events_lateness_profile",  # 1-row bucket-total crossJoin
    "events_psi_drift",  # 1-row stream-midpoint broadcast
    "dedup_threshold_sweep",  # 7-row broadcast threshold range join
    "events_power_analysis",  # (none today; 1-row aggregate only)
    "events_rolling_wau",  # broadcast day-grid range join (~days rows)
    # broadcast day-grid range joins over per-day HLL sketches + the
    # exact cross-check branch (bytes per day on both sides)
    "events_rolling_wau_sketch",
    "dedup_semantic",  # 8-centroid broadcast assignment (Lloyd)
    "ann_quantized_topk",  # 5-query broadcast side of the != pair join
    "source_mixture_plan",  # 1-row totals broadcast cross
    "text_bm25_scores",  # 1-row broadcast (N, avgdl) corpus-stats crossJoins
    "dedup_minhash_recall_eval",  # 1-row metric-count crossJoins
    "ann_hard_negatives",  # 8-anchor broadcast side of the label<> pair join
    # nprobe-sweep eval: ≤|cells|-row centroid crossJoins + cr<=nprobe
    # probe joins, every broadcast side bounded by nlist or |Q|
    "ann_ivf_recall_eval",
}


def test_no_query_plans_a_cartesian_product(spark):
    """Registry-wide sweep: no operator may degenerate into a shuffled
    cartesian product; nested-loop joins only where a tiny broadcast side
    makes them the right plan."""
    offenders = {}
    for name, spec in load_all().items():
        df = spec.builder(spark, SF_DIR)
        js = join_strategies(df)
        if js["CartesianProduct"]:
            offenders[name] = js
        if js["BroadcastNestedLoopJoin"] and name not in _NL_ALLOWED:
            offenders[name] = js
    assert not offenders, offenders
