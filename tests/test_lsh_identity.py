"""lsh identity gate on hash SETS (ADVICE r13 #3): an intra-doc
base_hash32 collision between two distinct shingles must not push a
set-identical pair's Jaccard below 1.0."""

from __future__ import annotations

from pyspark.sql import functions as F

from ranger_spark.operators import dedup


def _colliding_hash(col):
    """Stand-in base hash with a tiny codomain so distinct shingles
    collide deterministically inside one doc."""
    return (F.abs(F.hash(col)) % 4).cast("long")


# SQL twin of _colliding_hash: minhash_lsh_dedup builds its shingle-hash
# stage as one spark.sql parse (r14), so the collision seam to patch is
# the BASE_HASH32_SQL template, not the Column function.
_COLLIDING_HASH_SQL = "cast(abs(hash({c})) % 4 as bigint)"


def test_identity_pair_survives_intra_doc_hash_collision(spark, monkeypatch):
    # two docs with the SAME shingle-string set (re-ordered repetition:
    # same bigram multiset) — the identity class the fingerprint/oracle
    # collapse on. With a 4-value hash codomain, distinct shingles
    # collide within each doc, so the string-count denominator (n=old
    # definition) exceeds the hash-set size and the old Jaccard < 1.0.
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, text), (2, text + " alpha beta")],  # doc 2 repeats a bigram
        ["doc_id", "text"],
    )
    monkeypatch.setattr(dedup, "base_hash32", _colliding_hash)
    monkeypatch.setattr(dedup, "BASE_HASH32_SQL", _COLLIDING_HASH_SQL)

    pairs_fixed = dedup.minhash_lsh_dedup(
        df, "doc_id", "text",
        threshold=1.0, collapse_exact=False, jaccard_on_hash_sets=True,
    ).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in pairs_fixed] == [
        (1, 2, 1.0)
    ]

    # the old string-count definition drops the pair — that is the
    # divergence-from-oracle the fix removes
    pairs_old = dedup.minhash_lsh_dedup(
        df, "doc_id", "text",
        threshold=1.0, collapse_exact=False, jaccard_on_hash_sets=False,
    ).filter(F.col("jaccard") == 1.0).collect()
    assert pairs_old == []

    # and the group assignment built on the identity gate collapses them
    groups = dedup.lsh_neardup_groups(df, "doc_id", "text").collect()
    assert {(r["keeper_id"], r["dup_count"]) for r in groups} == {(1, 2)}


def test_hash_set_mode_matches_string_mode_without_collisions(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different content about sailing ships"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = dedup.minhash_lsh_dedup(
        df, "doc_id", "text", threshold=0.2, jaccard_on_hash_sets=False
    ).collect()
    b = dedup.minhash_lsh_dedup(
        df, "doc_id", "text", threshold=0.2, jaccard_on_hash_sets=True
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
