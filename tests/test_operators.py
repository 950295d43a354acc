"""Operator-level tests: dedup invariants, IVF recall vs brute force,
multimodal Arrow plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_exact_dedup_keeps_one_per_group(spark):
    from ranger_spark.operators.dedup import exact_dedup_groups, exact_dedup_keep

    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello, world!"), (3, "different text")],
        ["doc_id", "text"],
    )
    groups = exact_dedup_groups(df, "doc_id", "text").collect()
    # normalization makes rows 1 and 2 the same group; min id kept
    by_keeper = {r.keeper_id: r.dup_count for r in groups}
    assert by_keeper == {1: 2, 3: 1}
    kept = exact_dedup_keep(df, "doc_id", "text")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]


def test_minhash_identical_docs_collide(spark):
    from ranger_spark.operators.dedup import minhash_lsh_dedup

    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "entirely unrelated words about spark engines here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_dedup(
        df, "doc_id", "text", threshold=0.9, collapse_exact=False
    ).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard == 1.0
    # default pipeline collapses exact dupes first (LSH skew guard): the
    # identical pair disappears because only one representative survives
    collapsed = minhash_lsh_dedup(df, "doc_id", "text", threshold=0.9).collect()
    assert collapsed == []


def test_lsh_neardup_groups_shingle_set_identity(spark):
    """Threshold-1.0 LSH groups = shingle-set identity classes: the
    doubled/tripled re-paginations of one text collapse (identical
    bigram sets, guaranteed candidates), a reordering with a different
    bigram set stays separate, and singletons keep themselves."""
    from ranger_spark.operators.dedup import lsh_neardup_groups

    base = "alpha beta gamma delta epsilon zeta"
    rows = [
        (10, base),
        (11, base + " " + base),                # superset: + junction bigram
        (12, base + " " + base + " " + base),   # same set as 11
        (13, "zeta epsilon delta gamma beta alpha"),  # reversed: new bigrams
        (14, "totally different content entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    groups = {
        r.keeper_id: r.dup_count
        for r in lsh_neardup_groups(df, "doc_id", "text").collect()
    }
    # 11+12 share the set {base bigrams + (zeta,alpha)}; 10 lacks the
    # junction bigram so it stays out; 13/14 are singletons
    assert groups == {10: 1, 11: 2, 13: 1, 14: 1}


def test_shingle_set_fingerprint_matches_lsh_identity_groups(spark):
    """The map-only fingerprint keys EXACTLY the identity classes the
    LSH path discovers: grouping by the expression reproduces
    lsh_neardup_groups' partition on the same corpus, and the
    fingerprint is insensitive to repetition but sensitive to any set
    change."""
    from ranger_spark.operators.dedup import (
        lsh_neardup_groups,
        shingle_set_fingerprint,
    )

    base = "alpha beta gamma delta epsilon zeta"
    rows = [
        (10, base),
        (11, base + " " + base),
        (12, base + " " + base + " " + base),
        (13, "zeta epsilon delta gamma beta alpha"),
        (14, "totally different content entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    by_fp = (
        df.select("doc_id", shingle_set_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("dup_count"))
    )
    fp_groups = {r.keeper_id: r.dup_count for r in by_fp.collect()}
    lsh_groups = {
        r.keeper_id: r.dup_count
        for r in lsh_neardup_groups(df, "doc_id", "text").collect()
    }
    assert fp_groups == lsh_groups == {10: 1, 11: 2, 13: 1, 14: 1}


def test_simhash_close_for_similar(spark):
    from ranger_spark.operators.dedup import hamming32, simhash_signatures

    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six seven eight")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = simhash_signatures(df, "doc_id", "text")
    a = sig.alias("a").join(sig.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
    d = {
        (r.ida, r.idb): r.h
        for r in a.select(
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
            hamming32(F.col("a.simhash"), F.col("b.simhash")).alias("h"),
        ).collect()
    }
    assert d[(1, 2)] < d[(1, 3)]
    assert d[(1, 2)] < d[(2, 3)]


def test_ivf_recall_vs_brute_force(spark):
    from ranger_spark.operators.similarity import brute_force_topk, ivf_topk

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(q, e, k=10).collect()
    approx = ivf_topk(q, e, k=10, nprobe=5).collect()
    exact_set = {(r.q_id, r.vec_id) for r in exact}
    approx_set = {(r.q_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # random embeddings + label cells → recall is whatever nprobe/cells
    # delivers; assert the harness wiring (shape + a sane floor)
    assert len(approx_set) == len(exact_set)
    assert recall >= 0.3


def test_kmeans_ivf_beats_random_blocking(spark):
    from ranger_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_kmeans,
        kmeans_fit,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_fit(e, k=5, iters=3)
    rows = cents.collect()
    assert len(rows) == 5 and all(len(r.centroid) == 64 for r in rows)
    q = e.filter(F.col("vec_id") < 5)
    exact = {(r.q_id, r.vec_id) for r in brute_force_topk(q, e, k=10).collect()}

    def recall(nprobe):
        approx = {
            (r.q_id, r.vec_id)
            for r in ivf_topk_kmeans(
                q, e, k=10, nlist=5, nprobe=nprobe, iters=3
            ).collect()
        }
        return len(exact & approx) / len(exact)

    r1, r3 = recall(1), recall(3)
    # these embeddings are uniform random in 64-dim, so cells only weakly
    # correlate with neighborhoods (curse of dimensionality); assert the
    # structural properties: recall grows with nprobe and beats the
    # random-assignment expectation (nprobe/nlist)
    assert r3 > r1
    assert r3 >= 3 / 5, (r1, r3)


def test_brute_force_topk_ranks_are_dense(spark):
    from ranger_spark.operators.similarity import brute_force_topk

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = brute_force_topk(e.filter(F.col("vec_id") == 0), e, k=5).collect()
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
    assert all(r.vec_id != 0 for r in out)


def test_brute_force_topk_arrow_path_matches_fold(spark):
    # the Arrow/einsum scoring path must agree with the fold path at the
    # 6dp rounding the operator guarantees (values differ only in last ulps)
    from ranger_spark.operators.similarity import brute_force_topk

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3)
    fold = {tuple(r) for r in brute_force_topk(q, e, k=5).collect()}
    arrow = {tuple(r) for r in brute_force_topk(q, e, k=5, arrow=True).collect()}
    assert fold == arrow


def test_multimodal_decode_plumbing(spark):
    from ranger_spark.operators.multimodal import decode_features, with_payload_meta

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    meta = with_payload_meta(d, "text")
    row = meta.select("byte_len", "checksum", "mime", "payload").first()
    assert row.byte_len == len(row.payload)
    assert row.mime == "text/plain"
    feats = decode_features(d, "doc_id", "text")
    assert feats.columns == ["doc_id", "width", "height", "n_frames", "format"]
    rows = feats.collect()
    assert len(rows) == 20
    assert all(64 <= r.width <= 319 and r.format in ("png", "jpeg", "webp") for r in rows)
    # deterministic: same input → same fake features
    again = {r.doc_id: (r.width, r.height) for r in decode_features(d, "doc_id", "text").collect()}
    assert all(again[r.doc_id] == (r.width, r.height) for r in rows)


def test_real_decoder_is_explicit_stub():
    import pytest

    from ranger_spark.operators.multimodal import FakeDecoder

    with pytest.raises(NotImplementedError):
        FakeDecoder.decode(b"\x89PNG")


def test_lang_id_prefers_matching_stopwords(spark):
    from ranger_spark.operators.text import lang_id, normalize_text, tokenize

    df = spark.createDataFrame(
        [(1, "the cat and the dog is here"), (2, "der hund und die katze ist da"),
         (3, "xyz qqq zzz")],
        ["id", "text"],
    )
    out = {
        r.id: r.lang
        for r in df.select(
            "id", lang_id(tokenize(normalize_text(F.col("text")))).alias("lang")
        ).collect()
    }
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


def test_stratified_sample_rate_and_determinism(spark):
    from ranger_spark.operators.sampling import stratified_sample

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = d.count()
    s1 = stratified_sample(d, "doc_id", 0.2)
    s2 = stratified_sample(d, "doc_id", 0.2)
    k = s1.count()
    assert abs(k / n - 0.2) < 0.1  # Bernoulli tolerance at smoke scale
    assert k == s2.count()  # rerun-stable
    assert {r.doc_id for r in s1.collect()} == {r.doc_id for r in s2.collect()}
    # a higher rate strictly contains the lower one (nested samples)
    s5 = {r.doc_id for r in stratified_sample(d, "doc_id", 0.5).collect()}
    assert {r.doc_id for r in s1.collect()} <= s5


def test_pack_sequences_budget_and_order(spark):
    from pyspark.sql import functions as SF

    from ranger_spark.operators.sampling import pack_sequences
    from ranger_spark.operators.text import normalize_text, token_count

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang",
        token_count(normalize_text(SF.col("text"))).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(d, "doc_id", "n_tokens", 512, ["lang"]).collect()
    by_group: dict = {}
    for r in sorted(packed, key=lambda r: (r.lang, r.doc_id)):
        by_group.setdefault(r.lang, []).append(r)
    for rows in by_group.values():
        # offsets are the exclusive running total in doc_id order
        cum = 0
        for r in rows:
            assert r.seq_offset == cum
            assert r.seq_id == cum // 512
            cum += r.n_tokens
        # seq ids are dense & nondecreasing
        assert [r.seq_id for r in rows] == sorted(r.seq_id for r in rows)


def test_contamination_flags_planted_copy(spark):
    from pyspark.sql import functions as SF

    from ranger_spark.operators.sampling import contamination_check

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bmark = d.filter(SF.col("doc_id") < 5).select("text")
    # corpus contains the benchmark docs verbatim under other ids plus
    # unrelated docs
    planted = d.filter(SF.col("doc_id") < 5).select(
        (SF.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    rest = d.filter((SF.col("doc_id") >= 200) & (SF.col("doc_id") < 250)).select(
        "doc_id", "text"
    )
    report = contamination_check(
        planted.union(rest), bmark, "doc_id", "text", shingle_k=3,
        min_overlap_frac=0.99,
    ).collect()
    flagged = {r.doc_id for r in report}
    assert {100000, 100001, 100002, 100003, 100004} <= flagged
    assert all(r.overlap_frac >= 0.99 for r in report)


def test_hash_split_partitions_and_stability(spark):
    from ranger_spark.operators.sampling import hash_split

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = d.count()
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n  # total partition, no row lost/dup
    assert counts["train"] > counts.get("val", 0)
    # growth stability: splitting a subset assigns the same buckets
    sub = hash_split(
        d.filter(F.col("doc_id") < 100), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    full = {r.doc_id: r.split for r in out.filter(F.col("doc_id") < 100).collect()}
    assert {r.doc_id: r.split for r in sub.collect()} == full
    import pytest

    with pytest.raises(ValueError):
        hash_split(d, "doc_id", {"a": 0.5, "b": 0.2})


def test_tfidf_rare_term_outranks_common(spark):
    from ranger_spark.operators.text import tf_idf_terms

    rows = [
        (1, "common rare"),
        (2, "common common common"),
        (3, "common filler words"),
        (4, "rare common thing"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.doc_id, r.term): r.tfidf
        for r in tf_idf_terms(d, "doc_id", "text", min_df=2).collect()
    }
    # 'rare' (df=2) must outrank 'common' (df=4) at equal tf within doc 1
    assert out[(1, "rare")] > out[(1, "common")]
    # min_df filter drops singletons
    assert (3, "filler") not in out


def test_pack_ffd_respects_budget_and_beats_chunking(spark):
    from pyspark.sql import functions as SF

    from ranger_spark.operators.sampling import pack_sequences, pack_sequences_ffd
    from ranger_spark.operators.text import normalize_text, token_count

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang",
        token_count(normalize_text(SF.col("text"))).cast("long").alias("n_tokens"),
    )
    budget = 256
    ffd = pack_sequences_ffd(d, "doc_id", "n_tokens", budget, ["lang"])
    rows = ffd.collect()
    assert len(rows) == d.count()
    # every sequence a doc was placed into stays within budget unless a
    # single doc alone exceeds it
    from collections import defaultdict

    totals: dict = defaultdict(int)
    singles: dict = defaultdict(int)
    for r in rows:
        totals[(r.lang, r.seq_id)] += r.n_tokens
        singles[(r.lang, r.seq_id)] = max(singles[(r.lang, r.seq_id)], r.n_tokens)
    for k, tot in totals.items():
        assert tot <= budget or singles[k] > budget, (k, tot)
    # deterministic
    again = {(r.lang, r.doc_id): r.seq_id for r in ffd.collect()}
    assert {(r.lang, r.doc_id): r.seq_id for r in rows} == again
    # FFD never uses more sequences than contiguous chunking
    chunked = pack_sequences(d, "doc_id", "n_tokens", budget, ["lang"]).collect()
    n_ffd = len({(r.lang, r.seq_id) for r in rows})
    n_chunk = len({(r.lang, r.seq_id) for r in chunked})
    assert n_ffd <= n_chunk + 1  # +1 slack: chunking can straddle budgets


def test_pack_ffd_ungrouped_single_stream(spark):
    from ranger_spark.operators.sampling import pack_sequences_ffd

    d = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 60), (4, 250), (5, 50)], ["doc_id", "n_tokens"]
    )
    out = pack_sequences_ffd(d, "doc_id", "n_tokens", 300).collect()
    assert {r.doc_id for r in out} == {1, 2, 3, 4, 5}
    from collections import defaultdict

    totals: dict = defaultdict(int)
    for r in out:
        totals[r.seq_id] += r.n_tokens
    assert all(t <= 300 for t in totals.values())
    assert "__g" not in pack_sequences_ffd(d, "doc_id", "n_tokens", 300).columns


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def test_embedding_cosine_dedup_semantics(spark):
    """A synthetic block with one duplicate pair: the lower id survives with
    n_dups=1, the higher id is collapsed, unrelated rows survive with 0."""
    from pyspark.sql import Row

    from ranger_spark.operators.dedup import embedding_cosine_dedup

    rows = [
        Row(vec_id=1, label=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=2, label=0, embedding=[0.99, 0.01, 0.0]),  # near-dup of 1
        Row(vec_id=3, label=0, embedding=[0.0, 1.0, 0.0]),    # orthogonal
        Row(vec_id=4, label=1, embedding=[1.0, 0.0, 0.0]),    # other block
    ]
    out = embedding_cosine_dedup(
        spark.createDataFrame(rows), "vec_id", "embedding", "label", 0.9
    )
    got = {r["vec_id"]: r["n_dups"] for r in out.collect()}
    assert got == {1: 1, 3: 0, 4: 0}


def test_embedding_cosine_dedup_matches_bruteforce(spark):
    """Blocked dedup over real embeddings agrees with a driver-side n²
    verification at sf0.001 (500 vectors — brute force is cheap here)."""
    import itertools

    import numpy as np

    from ranger_spark.operators.dedup import embedding_cosine_dedup

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = e.collect()
    by_id = {r["vec_id"]: (r["label"], np.array(r["embedding"], dtype=np.float64)) for r in rows}
    pairs = set()
    for (i, (li, vi)), (j, (lj, vj)) in itertools.combinations(
        sorted(by_id.items()), 2
    ):
        if li == lj:
            c = float(vi @ vj / (np.linalg.norm(vi) * np.linalg.norm(vj)))
            if c >= 0.35:
                pairs.add((i, j))
    dominated = {j for _, j in pairs}
    expect = {
        i: sum(1 for a, _ in pairs if a == i)
        for i in by_id
        if i not in dominated
    }
    got = {
        r["vec_id"]: r["n_dups"]
        for r in embedding_cosine_dedup(e, threshold=0.35).collect()
    }
    assert got == expect


def test_hyperplane_buckets_lsh_recall(spark):
    """Sign-LSH banding recovers within-label pairs with cosine >= 0.35 at
    sf0.001 — the recall property that justifies swapping the label block
    for LSH buckets at scale. Band math: per-bit collision prob for angle
    theta is 1 - theta/pi = 0.61 at cos 0.35, so 3-bit buckets collide with
    p = 0.61^3 = 0.23 and 10 independent bands give expected recall
    1 - (1-0.23)^10 = 0.93 (real near-dup thresholds >= 0.9 need far fewer
    bands: p_bit = 0.857, 8 bits → p = 0.29 per band)."""
    from pyspark.sql import functions as F

    from ranger_spark.operators.dedup import hyperplane_buckets
    from ranger_spark.operators.similarity import _as_double, dot, l2_norm

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = e.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    ).withColumn("n", l2_norm(F.col("v")))
    # ground truth: within-label pairs over the threshold
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("blk"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("blk"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")) >= 0.35
        )
        .select("id_a", "id_b")
        .collect()
    }
    assert truth  # non-trivial at sf0.001 (14 pairs)
    # LSH candidates: union of banded bucket self-joins + label guard
    found: set = set()
    for seed in range(10):
        bucketed = base.withColumn(
            "bkt", hyperplane_buckets("v", bits=3, seed=seed)
        )
        aa = bucketed.select(
            F.col("vec_id").alias("id_a"),
            F.col("label").alias("lbl_a"),
            F.col("bkt"),
            F.col("v").alias("va"),
            F.col("n").alias("na"),
        )
        bb = bucketed.select(
            F.col("vec_id").alias("id_b"),
            F.col("label").alias("lbl_b"),
            F.col("bkt"),
            F.col("v").alias("vb"),
            F.col("n").alias("nb"),
        )
        cand = (
            aa.join(bb, "bkt")
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & (F.col("lbl_a") == F.col("lbl_b"))
            )
            .filter(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
                >= 0.35
            )
            .select("id_a", "id_b")
            .collect()
        )
        found |= {(r["id_a"], r["id_b"]) for r in cand}
        if truth <= found:
            break
    recall = len(found & truth) / len(truth)
    assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(truth)} pairs"


def test_repetition_metrics_hand_case(spark):
    """'a a a b' → 4 tokens, 2 distinct → dup 0.5; bigrams ('a a' ×2,
    'a b') → top bigram covers 2*2/4 = 1.0. Single-token doc → both 0."""
    from pyspark.sql import Row

    from ranger_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(
        [Row(doc_id=1, text="a a a b"), Row(doc_id=2, text="solo")]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_token_frac"], r["top_bigram_frac"])
        for r in repetition_metrics(df, "doc_id", "text").collect()
    }
    assert got[1] == (4, 0.5, 1.0)
    assert got[2] == (1, 0.0, 0.0)


def test_entropy_metrics_hand_case(spark):
    """'aabb' → uniform over {a,b} → char entropy 1.0; 'aaaa' → 0.
    Token entropy of 'x y x y' → 1.0."""
    from pyspark.sql import Row

    from ranger_spark.operators.text import entropy_metrics

    df = spark.createDataFrame(
        [Row(doc_id=1, text="aabb"), Row(doc_id=2, text="aaaa"),
         Row(doc_id=3, text="x y x y")]
    )
    got = {
        r["doc_id"]: (r["char_entropy"], r["token_entropy"])
        for r in entropy_metrics(df, "doc_id", "text").collect()
    }
    assert got[1] == (1.0, 0.0)   # chars {a:2,b:2}; one token 'aabb'
    assert got[2] == (0.0, 0.0)
    assert got[3][1] == 1.0       # tokens {x:2,y:2}


def test_repetition_and_entropy_match_python_reference(spark):
    """50 seeded random docs: repetition_metrics and entropy_metrics agree
    with a direct Python computation (collections.Counter + math.log2) at
    the operators' 6dp rounding — one Spark job, deterministic corpus."""
    import math
    import random
    from collections import Counter

    from pyspark.sql import Row

    from ranger_spark.operators.text import entropy_metrics, repetition_metrics

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "y2", "spark", "data"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60)))
        for _ in range(50)
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(docs)])

    def ref_entropy(counter):
        n = sum(counter.values())
        return round(
            math.log2(n) - sum(c * math.log2(c) for c in counter.values()) / n, 6
        )

    rep = {
        r["doc_id"]: (r["n_tokens"], r["dup_token_frac"], r["top_bigram_frac"])
        for r in repetition_metrics(df, "doc_id", "text").collect()
    }
    ent = {
        r["doc_id"]: (r["char_entropy"], r["token_entropy"])
        for r in entropy_metrics(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(docs):
        toks = t.split()
        n = len(toks)
        bigrams = Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        top = max(bigrams.values()) if bigrams else 0
        assert rep[i] == (
            n,
            round(1.0 - len(set(toks)) / n, 6),
            round(2.0 * top / n, 6),
        ), f"doc {i}"
        chars = Counter(t)
        assert ent[i] == (ref_entropy(chars), ref_entropy(Counter(toks))), f"doc {i}"


def test_incremental_minhash_matches_full_restricted(spark):
    """Incremental dedup (delta signed against the persisted store) uses
    incremental-keeper semantics: near-dup pairs match a full-corpus run
    restricted to ≥1 delta doc EXCEPT on exact groups spanning the split
    (a full run may re-elect a smaller delta id as representative);
    those arrivals are instead reported as jaccard-1.0 pairs against the
    stored keeper."""
    import hashlib
    import re as _re

    from ranger_spark.operators.dedup import (
        build_minhash_store,
        incremental_minhash_dedup,
        minhash_lsh_dedup,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = d.filter("doc_id % 4 != 0")
    delta = d.filter("doc_id % 4 = 0")

    # expected exact-arrival pairs, computed independently in python
    def norm(s):
        return _re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()

    groups: dict[str, list[int]] = {}
    for r in d.select("doc_id", "text").collect():
        groups.setdefault(norm(r.text), []).append(r.doc_id)
    exact_expected = set()
    ambiguous_ids = set()
    for ids in groups.values():
        b = [i for i in ids if i % 4 != 0]
        dd = [i for i in ids if i % 4 == 0]
        if b and dd:
            pair = (min(min(dd), min(b)), max(min(dd), min(b)))
            exact_expected.add(pair)
            ambiguous_ids.update(ids)

    store = build_minhash_store(base, "doc_id", "text")
    inc_rows = incremental_minhash_dedup(
        store, delta, "doc_id", "text", threshold=0.05
    ).collect()
    inc = {(r.id_a, r.id_b) for r in inc_rows}
    assert exact_expected <= {
        (r.id_a, r.id_b) for r in inc_rows if r.jaccard == 1.0
    }
    full = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup(
            d, "doc_id", "text", threshold=0.05
        ).collect()
        if r.id_a % 4 == 0 or r.id_b % 4 == 0
    }

    def unambiguous(pairs):
        return {
            p for p in pairs
            if p[0] not in ambiguous_ids and p[1] not in ambiguous_ids
        }

    # outside the re-election-ambiguous groups the two runs agree exactly
    assert unambiguous(inc) == unambiguous(full)


def test_chunk_sliding_covers_all_tokens_and_overlaps(spark):
    from ranger_spark.operators.chunking import chunk_sliding

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
            (2, "a b"),  # shorter than overlap
            (3, " ".join(f"t{i}" for i in range(8))),  # exactly chunk_size
        ],
        "doc_id long, text string",
    )
    out = chunk_sliding(docs, "doc_id", "text", chunk_size=8, overlap=2)
    rows = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.n_chunk_tokens)
        for r in out.collect()
    }
    # doc 1: starts 0 and 6 (stride 6, last start <= 10-3=7)
    assert rows[(1, 0)] == (0, 8)
    assert rows[(1, 1)] == (6, 4)
    # doc 2: single chunk, shorter than chunk_size
    assert rows[(2, 0)] == (0, 2)
    # doc 3: one full chunk exactly chunk_size long, no ghost 2nd chunk
    assert rows[(3, 0)] == (0, 8)
    assert (3, 1) not in rows
    # every token of doc 1 is covered: union of [start, start+8) = [0, 10)
    covered = set()
    for (d, _), (s, n) in rows.items():
        if d == 1:
            covered |= set(range(s, s + n))
    assert covered == set(range(10))


def test_chunk_starts_rejects_bad_overlap(spark):
    import pytest as _pytest

    from ranger_spark.operators.chunking import chunk_starts

    with _pytest.raises(ValueError):
        chunk_starts(F.lit(10), chunk_size=4, overlap=4)


def test_cross_doc_ngram_dup_hand_case(spark):
    from ranger_spark.operators.chunking import cross_doc_ngram_dup

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),   # 3-grams: "a b c", "b c d"
            (2, "a b c x"),   # 3-grams: "a b c", "b c x"
            (3, "p q r s"),   # no overlap with others
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_frac)
        for r in cross_doc_ngram_dup(docs, "doc_id", "text", n=3).collect()
    }
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (2, 0, 0.0)


def test_remove_dup_spans_hand_case(spark):
    from ranger_spark.operators.chunking import remove_dup_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c x y z"),      # "a b c" also in doc 2 → drop a,b,c
            (2, "q a b c r s"),      # same span at pos 1 → drop a,b,c
            (3, "u v w p q r"),      # no duplicated 3-gram anywhere
            (4, "m m m m"),          # "m m m" at pos 0 and 1 → all covered
            (5, "xx"),               # shorter than n → untouched
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_fp)
        for r in remove_dup_spans(docs, "doc_id", "text", n=3).collect()
    }
    import hashlib

    def fp(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[1] == (6, 3, fp("x y z"))
    assert out[2] == (6, 3, fp("q r s"))
    assert out[3] == (6, 0, fp("u v w p q r"))
    assert out[4] == (4, 4, fp(""))
    assert out[5] == (1, 0, fp("xx"))


def test_chunk_sliding_matches_python_mirror(spark):
    import hashlib
    import random

    from ranger_spark.operators.chunking import chunk_sliding

    rng = random.Random(7)
    docs = [
        (i, " ".join(rng.choice("abcdefgh") for _ in range(rng.randint(0, 40))))
        for i in range(60)
    ]
    size, ov = 8, 3
    expected = {}
    for i, text in docs:
        # Spark's split (and DuckDB's regexp_split_to_array, used by the
        # oracle) yield [''] for an empty string — one empty token
        toks = text.split() or [""]
        n = len(toks)
        stride = size - ov
        starts = list(range(0, max(n - ov - 1, 0) + 1, stride))
        for ci, s in enumerate(starts):
            chunk = toks[s : s + size]
            expected[(i, ci)] = (
                s,
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.n_chunk_tokens, r.chunk_fp)
        for r in chunk_sliding(df, "doc_id", "text", chunk_size=size, overlap=ov).collect()
    }
    assert got == expected


def test_bpe_train_and_encode_hand_case(spark):
    from ranger_spark.operators.bpe import bpe_encode, bpe_train_merges

    # classic BPE fixture: "lo" dominates, then "low"
    docs = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower"), (3, "lowest")],
        "doc_id long, text string",
    )
    merges = bpe_train_merges(docs, "text", n_merges=3).collect()
    got = [(r.merge_rank, r.pair_a, r.pair_b, r.merged, r.pair_count) for r in merges]
    # l+o appears in every word: 5 + 2 + 1 = 8; then lo+w: 8
    assert got[0] == (1, "l", "o", "lo", 8)
    assert got[1] == (2, "lo", "w", "low", 8)
    # third round: 'e' pairs from lower/lowest — low+e (2+1=3)
    assert got[2] == (3, "low", "e", "lowe", 3)

    enc = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode(
            docs, [(a, b) for _, a, b, _, _ in got], "doc_id", "text"
        ).collect()
    }
    # doc 1: 'low'x5 → one token each; doc 2: 'lower' → lowe+r = 2 each;
    # doc 3: 'lowest' → lowe+s+t = 3
    assert enc[1] == (5, 5)
    assert enc[2] == (2, 4)
    assert enc[3] == (1, 3)


def test_incremental_span_removal_matches_full(spark):
    from ranger_spark.operators.chunking import (
        build_gram_store,
        incremental_remove_dup_spans,
        remove_dup_spans,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = d.filter("doc_id % 4 != 0")
    delta = d.filter("doc_id % 4 = 0")
    store = build_gram_store(base, "doc_id", "text", n=3)
    inc = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_fp)
        for r in incremental_remove_dup_spans(
            store, delta, "doc_id", "text", n=3
        ).collect()
    }
    full = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_fp)
        for r in remove_dup_spans(d, "doc_id", "text", n=3).collect()
        if r.doc_id % 4 == 0
    }
    assert inc == full


def test_incremental_minhash_reports_exact_arrival(spark):
    """A batch doc with a smaller id than its stored exact twin must
    still surface as a duplicate (the corner a full re-run would hide by
    re-electing the new id as representative)."""
    from ranger_spark.operators.dedup import (
        build_minhash_store,
        incremental_minhash_dedup,
    )

    base = spark.createDataFrame(
        [(7, "alpha beta gamma delta"), (9, "unrelated words entirely here")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(4, "alpha beta gamma delta")], "doc_id long, text string"
    )
    store = build_minhash_store(base, "doc_id", "text")
    pairs = incremental_minhash_dedup(
        store, delta, "doc_id", "text", threshold=0.5
    ).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [(4, 7, 1.0)]


def test_quantized_topk_recall_vs_float(spark):
    """The int8-quantized search must substantially agree with the float
    search: ≥80% of each query's float top-10 survives quantization
    (symmetric int8 over unit-ish embeddings loses <1% cosine
    precision)."""
    from ranger_spark.operators.similarity import (
        brute_force_topk,
        quantize_int8,
    )
    from ranger_spark.tables import load
    from pyspark.sql import functions as F

    e = load(spark, SF_DIR, "embeddings")
    exact = brute_force_topk(e.filter(F.col("vec_id") < 3), e, k=10)
    q8 = quantize_int8(e).select(
        "vec_id", F.transform(F.col("q"), lambda x: x.cast("double")).alias("qv")
    )
    quant = brute_force_topk(
        q8.filter(F.col("vec_id") < 3), q8, vec_col="qv", k=10
    )
    ex = {(r.q_id, r.vec_id) for r in exact.collect()}
    qt = {(r.q_id, r.vec_id) for r in quant.collect()}
    assert len(ex & qt) >= 0.8 * len(ex)


def test_table_plan_cache_identity_and_scoping(spark):
    """tables.load caches the lazy plan per (session, sf_dir, table,
    bucketed-db conf): same args → same object (no re-listing); a
    different sf_dir or a bucketed-db opt-in change must MISS."""
    from ranger_spark.tables import load

    a = load(spark, SF_DIR, "nation")
    assert load(spark, SF_DIR, "nation") is a
    assert load(spark, SF_DIR, "region") is not a
    spark.conf.set("spark.ranger.bucketed.db", "not_a_real_db")
    try:
        b = load(spark, SF_DIR, "nation")
        assert b is not a  # conf change → different cache key
    finally:
        spark.conf.set("spark.ranger.bucketed.db", "")
    assert load(spark, SF_DIR, "nation") is a


def test_ann_corpus_pin_invalidates_with_dataframe(spark):
    """The driver-kernel corpus pin is weak-keyed by the corpus
    DataFrame: a NEW read (new plan object) recomputes; the same object
    reuses the pinned matrix and stays hash-identical."""
    from ranger_spark.operators import similarity as S
    from ranger_spark.tables import _PLAN_CACHE

    spark_cache = _PLAN_CACHE.get(spark)
    if spark_cache:
        spark_cache.clear()  # force fresh DataFrame objects below
    e1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [(0, [1.0] * 64)]
    r1 = sorted(map(tuple, S.brute_force_topk(q, e1, k=5).collect()))
    assert (e1 in S._CORPUS_PIN) and S._CORPUS_PIN[e1]
    r1b = sorted(map(tuple, S.brute_force_topk(q, e1, k=5).collect()))
    assert r1b == r1  # pinned rerun identical
    e2 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert e2 is not e1 and e2 not in S._CORPUS_PIN
    r2 = sorted(map(tuple, S.brute_force_topk(q, e2, k=5).collect()))
    assert r2 == r1  # fresh decode agrees with the pin


def test_ivf_index_build_once_serve_many(spark):
    """Prebuilt IVF index (build_ivf_index) answers multiple query
    batches identically to the fit-per-call pipeline (ivf_topk_kmeans)
    without re-clustering; a corpus delta extends the index via
    assign_cells against the FROZEN centroids."""
    from pyspark.sql import functions as F

    from ranger_spark.operators.similarity import (
        assign_cells,
        build_ivf_index,
        ivf_search,
        ivf_topk_kmeans,
        l2_norm,
        _as_double,
    )
    from ranger_spark.tables import load

    e = load(spark, SF_DIR, "embeddings")
    idx = {
        k: v.localCheckpoint() for k, v in build_ivf_index(
            e, nlist=8, iters=3
        ).items()
    }
    for lo, hi in ((0, 3), (3, 6)):
        qs = e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        got = sorted(
            map(tuple, ivf_search(idx, qs, k=5, nprobe=3).collect())
        )
        want = sorted(
            map(
                tuple,
                ivf_topk_kmeans(qs, e, k=5, nlist=8, nprobe=3, iters=3)
                .collect(),
            )
        )
        assert got == want
    # delta append: assign new vectors against the frozen centroids
    delta = e.filter(F.col("vec_id") < 2).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    )
    extra = assign_cells(delta, idx["centroids"]).select(
        "vec_id",
        F.col("v").alias("c_vec"),
        l2_norm(F.col("v")).alias("c_norm"),
        "cell",
    )
    idx2 = {
        "centroids": idx["centroids"],
        "assignments": idx["assignments"].unionByName(extra),
    }
    qs = e.filter(F.col("vec_id") < 2)
    r = ivf_search(idx2, qs, k=3, nprobe=8).collect()
    # each query's exact duplicate (cos 1.0) must now surface
    top = {(x.q_id, x.rank): (x.vec_id, x.cos_sim) for x in r}
    assert top[(0, 1)][0] == 1_000_000 and top[(0, 1)][1] == 1.0
    assert top[(1, 1)][0] == 1_000_001 and top[(1, 1)][1] == 1.0


def test_ivf_search_local_queries_parity(spark):
    """Driver-local query pairs (the serving shape) return EXACTLY the
    distributed ivf_search rows, with the pinned-index fast path
    engaged; the pinned copy invalidates nothing — a fresh index dict
    serves fresh data."""
    from pyspark.sql import functions as F

    from ranger_spark.operators.similarity import build_ivf_index, ivf_search
    from ranger_spark.tables import load

    e = load(spark, SF_DIR, "embeddings")
    idx = {
        k: v.localCheckpoint()
        for k, v in build_ivf_index(e, nlist=8, iters=3).items()
    }
    qdf = e.filter(F.col("vec_id") < 4)
    qlocal = [(r["vec_id"], r["embedding"]) for r in qdf.collect()]
    a = sorted(map(tuple, ivf_search(idx, qdf, k=5, nprobe=3).collect()))
    b = sorted(map(tuple, ivf_search(idx, qlocal, k=5, nprobe=3).collect()))
    assert a == b and len(a) > 0
    # second batch reuses the pinned centroid/assignment copies
    assert "_cents_np" in idx
    q2 = [(r["vec_id"], r["embedding"]) for r in
          e.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 6)).collect()]
    a2 = sorted(map(tuple, ivf_search(
        idx, e.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 6)),
        k=5, nprobe=3).collect()))
    b2 = sorted(map(tuple, ivf_search(idx, q2, k=5, nprobe=3).collect()))
    assert a2 == b2


class TestBloomPrefilter:
    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon zeta")],
            "doc_id bigint, text string",
        )
        batch = spark.createDataFrame(
            [
                (10, "Gamma   DELTA!"),  # dup of 2 after normalization
                (11, "brand new words"),
                (12, "alpha beta"),      # dup of 1 verbatim
                (13, "another fresh doc"),
            ],
            "doc_id bigint, text string",
        )
        return corpus, batch

    def test_exact_anti_join_semantics(self, spark):
        from ranger_spark.operators.dedup import bloom_prefilter_new

        corpus, batch = self._frames(spark)
        got = {
            r["doc_id"] for r in bloom_prefilter_new(corpus, batch).collect()
        }
        assert got == {11, 13}

    def test_saturation_fallback_same_answer(self, spark, monkeypatch):
        import ranger_spark.operators.dedup as D

        corpus, batch = self._frames(spark)
        monkeypatch.setattr(D, "_MAYBE_CAP", -1)  # force the anti-join path
        got = {
            r["doc_id"]
            for r in D.bloom_prefilter_new(corpus, batch).collect()
        }
        assert got == {11, 13}

    def test_no_false_negatives(self, spark):
        """Every corpus member must probe as maybe-seen (bloom guarantee)."""
        import numpy as np

        from ranger_spark.operators.dedup import (
            _BLOOM_BITS_LOG2,
            _bloom_indexes,
            _hash_cols,
            build_fingerprint_bloom,
        )
        from pyspark.sql import functions as F

        corpus = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc number "), F.col("id")).alias("text"),
        )
        bits = np.frombuffer(
            build_fingerprint_bloom(corpus), dtype=np.uint8
        )
        h1, h2 = _hash_cols(F.col("text"))
        hashed = corpus.select(h1.alias("h1"), h2.alias("h2")).toPandas()
        mask = (1 << _BLOOM_BITS_LOG2) - 1
        maybe = np.ones(len(hashed), dtype=bool)
        for idx in _bloom_indexes(
            hashed["h1"].to_numpy(), hashed["h2"].to_numpy(), mask
        ):
            maybe &= (
                (bits[(idx >> np.uint64(3)).astype(np.int64)]
                 >> (idx & np.uint64(7)).astype(np.uint8)) & 1
            ).astype(bool)
        assert maybe.all()


def test_dsir_logratio_orders_target_like_docs_higher(spark):
    """A pool doc written in the target's vocabulary must outscore a pool
    doc written in pool-only vocabulary (sign check on the log ratio)."""
    from pyspark.sql import functions as F

    from ranger_spark.operators.sampling import dsir_logratio_scores

    rows = (
        [(i, "wiki science math proof", True) for i in range(10)]
        + [(100 + i, "spam casino pills win", False) for i in range(10)]
        + [(200, "wiki science proof", False), (201, "spam casino win", False)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, text string, t boolean")
    got = {
        r["doc_id"]: r["dsir_logratio"]
        for r in dsir_logratio_scores(
            df, "doc_id", "text", is_target=F.col("t"), dim=64
        ).collect()
    }
    assert got[200] > 0 > got[201]
    assert 200 in got and 201 in got and 1 not in got  # target docs unscored


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from ranger_spark.operators.similarity import embedding_covariance

    rng = np.random.default_rng(7)
    X = rng.normal(size=(40, 5)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    ).repartition(4)
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(df).collect()
    }
    want = np.cov(X, rowvar=False, bias=True)
    assert len(got) == 15
    for (i, j), v in got.items():
        assert abs(v - want[i, j]) < 1e-6, (i, j, v, want[i, j])


def test_pq_encode_codes_in_range_and_consistent(spark):
    import numpy as np

    from ranger_spark.operators.similarity import pq_encode

    rng = np.random.default_rng(3)
    X = rng.normal(size=(60, 8))
    X[59] = X[0]  # duplicate vector must get identical codes
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(60)],
        "vec_id bigint, embedding array<double>",
    ).repartition(3)
    rows = {r["vec_id"]: r for r in pq_encode(df, m=2, k=4, iters=2).collect()}
    assert len(rows) == 60
    for r in rows.values():
        assert 0 <= r["code0"] < 4 and 0 <= r["code1"] < 4
    assert (rows[0]["code0"], rows[0]["code1"]) == (
        rows[59]["code0"],
        rows[59]["code1"],
    )


def test_pca_projection_recovers_dominant_direction(spark):
    """Data with variance overwhelmingly along axis 0 must project ≈ its
    centered first coordinate (up to the power-iteration sign)."""
    import numpy as np

    from ranger_spark.operators.similarity import pca_project_top1

    rng = np.random.default_rng(11)
    X = np.zeros((80, 4))
    X[:, 0] = rng.normal(scale=10.0, size=80)
    X[:, 1:] = rng.normal(scale=0.1, size=(80, 3))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(80)],
        "vec_id bigint, embedding array<double>",
    ).repartition(4)
    got = {
        r["vec_id"]: r["pc1"] for r in pca_project_top1(df).collect()
    }
    centered = X[:, 0] - X[:, 0].mean()
    projs = np.array([got[i] for i in range(80)])
    corr = np.corrcoef(projs, centered)[0, 1]
    assert abs(corr) > 0.999


def test_pq_adc_recall_beats_random(spark):
    """ADC top-10 over PQ codes must overlap substantially with exact
    L2 top-10 (recall sanity — quantized search approximates, not
    random)."""
    import numpy as np

    from ranger_spark.operators.similarity import pq_adc_topk

    rng = np.random.default_rng(5)
    X = rng.normal(size=(200, 8))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(200)],
        "vec_id bigint, embedding array<double>",
    )
    got = pq_adc_topk(
        df.filter("vec_id < 2"), df, m=2, k_codebook=16, iters=2, k=10
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], set()).add(r["vec_id"])
    assert set(by_q) == {0, 1}
    for q in (0, 1):
        d2 = ((X - X[q]) ** 2).sum(axis=1)
        exact = set(np.argsort(d2, kind="stable")[:10].tolist())
        assert len(by_q[q] & exact) >= 4, (q, by_q[q], exact)


def test_routed_quality_gate_routes_thresholds_by_language(spark):
    # the same text must pass or fail depending on the ROUTED language:
    # stop hits count against the routed language's list and the
    # thresholds switch with it (unknown langs fall back to 'und')
    from ranger_spark.operators.text import routed_quality_gate

    en_text = " ".join(["the quick brown fox jumps of and it is that"] * 5)
    df = spark.createDataFrame(
        [
            (1, en_text, "en"),    # 50 words: meets en min_units=50 -> passes
            (2, en_text, "de"),    # same text routed de: 0 de stop hits -> fails
            (3, en_text, "xx"),    # unknown lang -> 'und' row: 50 < 60 -> fails
        ],
        ["id", "text", "routed"],
    )
    m = routed_quality_gate(F.col("text"), F.col("routed"))
    out = {
        r.id: (r.passes, r.stop_hits)
        for r in df.select("id", m["passes"].alias("passes"),
                           m["stop_hits"].alias("stop_hits")).collect()
    }
    assert out[1][0] is True and out[1][1] > 0
    assert out[2] == (False, 0)
    assert out[3][0] is False  # 50 words < und min_units 60


def test_routed_quality_gate_custom_gates(spark):
    from ranger_spark.operators.text import routed_quality_gate

    gates = {
        "en": {"min_units": 2, "min_alpha_frac": 0.5, "min_stop_hits": 0},
    }  # no 'und' row: must fall back to DEFAULT_LANG_GATES['und']
    df = spark.createDataFrame(
        [(1, "tiny text here", "en"), (2, "tiny text here", "xx")],
        ["id", "text", "routed"],
    )
    m = routed_quality_gate(F.col("text"), F.col("routed"), gates=gates)
    out = {r.id: r.p for r in df.select("id", m["passes"].alias("p")).collect()}
    assert out[1] is True
    assert out[2] is False  # routed to the synthesized strict 'und' row


def test_routed_quality_gate_char_unit_language(spark):
    # r12 review finding: a word-based zh row is unsatisfiable for real
    # unsegmented Chinese (whitespace tokenization ~1 "word", exact-token
    # intersect never hits single-char stopwords). unit="chars" rows
    # count characters and stopword hits by containment.
    from ranger_spark.operators.text import routed_quality_gate

    zh_text = "我们在这里有一个关于数据处理的很长的中文文档" * 2  # 44 chars, has 的/在/有/我
    df = spark.createDataFrame(
        [(1, zh_text, "zh"), (2, "short", "zh")],
        ["id", "text", "routed"],
    )
    m = routed_quality_gate(F.col("text"), F.col("routed"))
    out = {
        r.id: (r.p, r.n, r.h)
        for r in df.select(
            "id",
            m["passes"].alias("p"),
            m["n_units"].alias("n"),
            m["stop_hits"].alias("h"),
        ).collect()
    }
    assert out[1][0] is True and out[1][1] >= 40 and out[1][2] >= 3
    assert out[2][0] is False  # 5 chars < zh min_units 20
