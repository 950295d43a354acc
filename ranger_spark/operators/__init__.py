"""Operator toolbox — public API.

Dedup:       exact_dedup_groups, exact_dedup_keep, minhash_lsh_dedup,
             ngram_jaccard_blocked, simhash_signatures, hamming32
Similarity:  brute_force_topk, ivf_topk, ivf_topk_kmeans, kmeans_fit,
             similar_pairs_blocked, cosine, dot, l2_norm
Text:        tokenize, token_count, lang_id, quality_metrics, fingerprint
Multimodal:  with_payload_meta, decode_features, resize_stub,
             frame_sample_stub
Time series: asof_join, range_join_buckets
Sampling:    stratified_sample, hash_split, pack_sequences,
             pack_sequences_ffd, contamination_check
Skew:        salted_join, salted_agg
Rollup:      compute_rollup, refresh_rollup
"""

from ranger_spark.operators.dedup import (  # noqa: F401
    exact_dedup_groups,
    exact_dedup_keep,
    hamming32,
    minhash_lsh_dedup,
    ngram_jaccard_blocked,
    simhash_signatures,
)
from ranger_spark.operators.multimodal import (  # noqa: F401
    decode_features,
    frame_sample_stub,
    resize_stub,
    with_payload_meta,
)
from ranger_spark.operators.rollup import compute_rollup, refresh_rollup  # noqa: F401
from ranger_spark.operators.sampling import (  # noqa: F401
    contamination_check,
    hash_split,
    pack_sequences,
    pack_sequences_ffd,
    stratified_sample,
)
from ranger_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    cosine,
    dot,
    ivf_topk,
    ivf_topk_kmeans,
    kmeans_fit,
    l2_norm,
    similar_pairs_blocked,
)
from ranger_spark.operators.skew import salted_agg, salted_join  # noqa: F401
from ranger_spark.operators.text import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_metrics,
    token_count,
    tokenize,
)
from ranger_spark.operators.timeseries import (  # noqa: F401
    asof_join,
    range_join_buckets,
)
