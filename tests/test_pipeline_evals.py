"""Structural invariants of the round-7 session-3 operators — properties
the oracle hash-compare cannot express (monotonicity, bounds, cross-row
relations)."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    from ranger_spark.queries import load_all

    return load_all()


def test_ivf_recall_monotone_in_nprobe(spark, reg):
    """Probing more cells can only add candidates → recall@10 is
    non-decreasing in nprobe, and hits are bounded by |Q|·k."""
    rows = reg["ann_ivf_recall_eval"].builder(spark, SF_DIR).collect()
    by_np = {r["nprobe"]: r for r in rows}
    assert sorted(by_np) == [1, 2, 3, 5]
    rec = [by_np[np]["recall"] for np in (1, 2, 3, 5)]
    assert all(b >= a for a, b in zip(rec, rec[1:]))
    assert all(0.0 <= r <= 1.0 for r in rec)
    assert all(0 <= by_np[np]["hits"] <= 50 for np in by_np)


def test_kcenter_selection_distances_non_increasing(spark, reg):
    """Farthest-point traversal: each selected center's distance to the
    already-selected set is the max remaining — the selection-time
    distances are non-increasing after the seed, and ids are unique."""
    rows = sorted(
        reg["sample_kcenter_coreset"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["sel_order"],
    )
    assert [r["sel_order"] for r in rows] == list(range(1, 9))
    assert len({r["vec_id"] for r in rows}) == 8
    d = [r["dist"] for r in rows[1:]]  # seed reports 0.0
    assert all(b <= a for a, b in zip(d, d[1:]))
    assert all(x >= 0 for x in d)


def test_hard_negatives_cross_label_only(spark, reg):
    """Every mined negative carries a different label than its anchor,
    ranks are 1..5 per anchor, similarity is sorted within anchor."""
    rows = reg["ann_hard_negatives"].builder(spark, SF_DIR).collect()
    by_q: dict = {}
    for r in rows:
        assert r["neg_label"] != r["q_label"]
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sims = [r["cos_sim"] for r in rs]
        assert all(b <= a for a, b in zip(sims, sims[1:]))


def test_oov_rate_bounds_and_consistency(spark, reg):
    rows = reg["text_oov_rate"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0.0 <= r["oov_rate"] <= 1.0


def test_logreg_moves_toward_positive_class(spark, reg):
    """3 GD steps from w=0: weights are finite, change every iteration,
    and the bias moves in the direction of the class imbalance."""
    import math

    rows = sorted(
        reg["quality_classifier_logreg"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["iter"],
    )
    assert [r["iter"] for r in rows] == [1, 2, 3]
    prev = (0.0, 0.0, 0.0, 0.0)
    for r in rows:
        cur = (r["w1"], r["w2"], r["w3"], r["b"])
        assert all(math.isfinite(x) for x in cur)
        assert cur != prev
        prev = cur
    # documents are mostly non-English → gradient pushes b negative
    assert rows[0]["b"] < 0


def test_inverted_index_head_posting_consistent(spark, reg):
    rows = reg["text_inverted_index"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["df"] >= 10
        assert r["cf"] >= r["df"]  # every posting has tf >= 1
        assert r["top_tf"] >= 1
