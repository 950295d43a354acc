"""Document chunking and cross-document duplication metrics — the RAG /
pretraining preprocessing ops a 100 TB text pipeline needs next to dedup.

Reference parity note: the reference (gear6io/ranger) has no chunking
operator; these extend the LLM-pipeline surface (BASELINE.json north-star)
the same way operators/dedup.py and operators/text.py do.

Scale design:

- ``chunk_sliding`` is map-only (tokenize → computed start offsets →
  ``posexplode``): no shuffle, no Python, output rows ≈ tokens/stride per
  doc. At 100 TB this is embarrassingly parallel and bounded by the scan.
- ``cross_doc_ngram_dup`` is the cross-corpus twin of
  ``text.repetition_metrics`` (within-doc): one shuffle on the 64-bit
  n-gram hash with map-side combine (distinct per doc first), then one
  per-doc aggregate. Gram cardinality, not corpus size, drives the
  shuffle; grams travel as 8-byte hashes, never as strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ranger_spark.operators import text as T


def chunk_starts(n_tokens: Column, chunk_size: int, overlap: int) -> Column:
    """0-based chunk start offsets: 0, stride, 2*stride, … while
    ``start <= n_tokens - overlap - 1`` (so every token is covered and no
    chunk is a suffix-duplicate of the previous one); one chunk for docs
    shorter than ``overlap``."""
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("chunk_size must exceed overlap")
    return F.sequence(
        F.lit(0),
        F.greatest(n_tokens - F.lit(overlap + 1), F.lit(0)),
        F.lit(stride),
    )


def chunk_sliding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window token chunks per document.

    Returns (id, chunk_idx, chunk_start, n_chunk_tokens, chunk_fp) where
    chunk_fp is the md5 of the space-rejoined chunk text (the id a vector
    store / dedup pass would key on). Map-only: see module docstring.
    """
    toks = T.tokenize(T.normalize_text(F.col(text_col)))
    d = df.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__n", F.size("__toks")
    )
    d = d.select(
        id_col,
        "__toks",
        F.posexplode(chunk_starts(F.col("__n"), chunk_size, overlap)).alias(
            "chunk_idx", "chunk_start"
        ),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_start") + 1, chunk_size)
    return d.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )


def cross_doc_ngram_dup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document cross-corpus duplication: the fraction of a document's
    DISTINCT word n-grams that also occur in at least one other document
    (the corpus-level contamination signal used to rank near-dup docs).

    Returns (id, n_grams, n_dup_grams, dup_frac). Two shuffles, both on
    8-byte hashes: a windowed doc-count per gram hash (``word_shingles``
    is already per-doc distinct, so no distinct shuffle; the unordered
    window is one hash exchange with no sort-and-join round trip), then a
    per-doc aggregate.
    """
    from pyspark.sql import Window

    toks = T.tokenize(T.normalize_text(F.col(text_col)))
    grams = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(
            id_col,
            F.explode(T.word_shingles(F.col("__toks"), k=n)).alias("__gram"),
        )
        .select(id_col, T.hash64(F.col("__gram")).alias("__g"))
    )
    docs_per_gram = F.count(F.lit(1)).over(Window.partitionBy("__g"))
    return (
        grams.withColumn("__docs", docs_per_gram)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("__docs") > 1, 1).otherwise(0)).alias(
                "n_dup_grams"
            ),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("n_dup_grams") / F.col("n_grams"), 6),
        )
    )


def remove_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    collapse_exact: bool = True,
) -> DataFrame:
    """Exact duplicated-span removal (the substring-dedup pretraining
    cleanup of Lee et al. 2021, re-expressed relationally): any n-token
    window whose exact content occurs more than once in the corpus is
    marked, and every token covered by a marked window is dropped; the
    survivors are reassembled in order.

    Returns (id, n_tokens, n_removed, cleaned_fp) with cleaned_fp the md5
    of the space-rejoined surviving tokens.

    Scale shape: positioned gram hashes shuffle as 8 bytes + position
    (O(tokens) rows, the unavoidable floor for exact substring semantics);
    the occurrence count is one unordered window over the gram hash;
    covered indexes collapse to one small per-doc array (dup spans only),
    applied back with an indexed JVM ``filter`` — the full token stream is
    never re-shuffled for reassembly.

    ``collapse_exact`` (default, same guard as
    ``dedup.minhash_lsh_dedup``): span marking runs once per DISTINCT
    normalized text, with each representative's grams weighted by its
    copy count, and the per-representative result fans back out over a
    16-byte-digest join. Identical results by symmetry; on a corpus with
    duplicate documents the gram stream shrinks from O(total tokens) to
    O(distinct tokens) — measured 22 s → 1.5 s on the 64×-replicated
    (all-duplicates) sweep corpus.
    """
    from pyspark.sql import Window

    toks = T.tokenize(T.normalize_text(F.col(text_col)))
    base = df.select(F.col(id_col), toks.alias("__toks"))
    if collapse_exact:
        keyed = base.withColumn("__fp", F.md5(F.array_join("__toks", " ")))
        # Group on the token array itself: the first(array) buffer of
        # the md5-keyed form is var-length, which forces SortAggregate
        # (sorts on both sides of the collapse exchange). An array key
        # keeps the count() buffer primitive (HashAggregate) and
        # shuffles the same bytes — the array traveled as the first()
        # buffer before, as the key now. __fp is derived after the
        # aggregation for the fan-out join below.
        d = (
            base.groupBy("__toks")
            .agg(F.count(F.lit(1)).alias("__mult"))
            .withColumn("__fp", F.md5(F.array_join("__toks", " ")))
            .withColumn("__n", F.size("__toks"))
        )
        key = "__fp"
    else:
        d = base.withColumn("__n", F.size("__toks")).withColumn(
            "__mult", F.lit(1)
        )
        key = id_col
    # positioned n-gram hashes: pos in [0, n_tok - n]
    grams = (
        d.filter(F.col("__n") >= n)
        .select(
            key,
            "__mult",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__n") - n),
                    lambda i: F.struct(
                        i.alias("pos"),
                        T.hash64(
                            F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n))
                        ).alias("gh"),
                    ),
                )
            ).alias("g"),
        )
        .select(key, "__mult", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    )
    occurrences = F.sum("__mult").over(Window.partitionBy("gh"))
    covered = (
        grams.withColumn("__cnt", occurrences)
        .filter(F.col("__cnt") > 1)
        .select(
            key,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("idx"),
        )
        .groupBy(key)
        .agg(F.collect_set("idx").alias("__cov"))
    )
    out = d.join(covered, key, "left").withColumn(
        "__cov", F.coalesce(F.col("__cov"), F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.col("__toks"),
        lambda x, i: ~F.array_contains(F.col("__cov"), i.cast("int")),
    )
    result = out.select(
        key,
        F.col("__n").alias("n_tokens"),
        F.size("__cov").alias("n_removed"),
        F.md5(F.array_join(kept, " ")).alias("cleaned_fp"),
    )
    if collapse_exact:
        # fan the per-representative result back out to every copy
        result = keyed.select(id_col, "__fp").join(result, "__fp").drop("__fp")
        return result.select(id_col, "n_tokens", "n_removed", "cleaned_fp")
    return result


def build_gram_store(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
) -> DataFrame:
    """Aggregate the corpus's positioned-gram stream into the persistent
    (gram-hash → occurrence count) store that
    :func:`incremental_remove_dup_spans` probes — the span-removal twin
    of ``dedup.build_minhash_store``. O(distinct grams) rows, 16 bytes
    each."""
    toks = T.tokenize(T.normalize_text(F.col(text_col)))
    d = df.select(toks.alias("__toks")).withColumn("__n", F.size("__toks"))
    return (
        d.filter(F.col("__n") >= n)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__n") - n),
                    lambda i: T.hash64(
                        F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n))
                    ),
                )
            ).alias("gh")
        )
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("base_cnt"))
    )


def incremental_remove_dup_spans(
    store: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
) -> DataFrame:
    """Span-removal for newly ingested documents only (the 100 TB
    ingest pattern, like ``dedup.incremental_minhash_dedup``): a delta
    gram is duplicated if its occurrences across the EXISTING corpus
    (the store) plus the delta itself exceed one. Cost is
    O(delta tokens) plus one hash-join probe of the store — the base
    corpus is never rescanned. Output schema matches
    :func:`remove_dup_spans`, restricted to delta documents."""
    from pyspark.sql import Window

    toks = T.tokenize(T.normalize_text(F.col(text_col)))
    d = delta.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__n", F.size("__toks")
    )
    grams = (
        d.filter(F.col("__n") >= n)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__n") - n),
                    lambda i: F.struct(
                        i.alias("pos"),
                        T.hash64(
                            F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n))
                        ).alias("gh"),
                    ),
                )
            ).alias("g"),
        )
        .select(id_col, F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    )
    delta_occ = F.count(F.lit(1)).over(Window.partitionBy("gh"))
    covered = (
        grams.withColumn("__delta_cnt", delta_occ)
        .join(store, "gh", "left")
        .withColumn(
            "__total", F.col("__delta_cnt") + F.coalesce("base_cnt", F.lit(0))
        )
        .filter(F.col("__total") > 1)
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("idx"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("idx").alias("__cov"))
    )
    out = d.join(covered, id_col, "left").withColumn(
        "__cov", F.coalesce(F.col("__cov"), F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.col("__toks"),
        lambda x, i: ~F.array_contains(F.col("__cov"), i.cast("int")),
    )
    return out.select(
        id_col,
        F.col("__n").alias("n_tokens"),
        F.size("__cov").alias("n_removed"),
        F.md5(F.array_join(kept, " ")).alias("cleaned_fp"),
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document novelty: the fraction of a document's DISTINCT word
    n-grams that it INTRODUCES to the corpus — i.e. no document with a
    smaller id contains them. The curriculum/memorization signal dual to
    :func:`cross_doc_ngram_dup`: dup_frac asks "is this elsewhere?",
    novel_frac asks "did we see it first?" — a low-novelty late document
    is pure rehash and a dedup/downsample candidate.

    Returns (id, n_grams, n_novel, novel_frac). Same two hash shuffles
    as cross_doc_ngram_dup: a windowed min-id per gram hash, then a
    per-doc aggregate — grams travel as 8-byte hashes, never strings.
    """
    from pyspark.sql import Window

    toks = T.tokenize(T.normalize_text(F.col(text_col)))
    grams = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(
            id_col,
            F.explode(T.word_shingles(F.col("__toks"), k=n)).alias("__gram"),
        )
        .select(id_col, T.hash64(F.col("__gram")).alias("__g"))
    )
    first_doc = F.min(id_col).over(Window.partitionBy("__g"))
    return (
        grams.withColumn("__first", first_doc)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("__first") == F.col(id_col), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .withColumn(
            "novel_frac",
            F.round(F.col("n_novel") / F.col("n_grams"), 6),
        )
    )
