"""Sampling and sequence-assembly operators for training-data pipelines.

Three ops a 100 TB corpus pipeline needs between "cleaned documents" and
"training batches":

- **Deterministic stratified sampling** — keep a fixed fraction per
  stratum using a seeded md5-uniform on the row id. No rand(): reruns,
  retries, and the SQL oracle all select the SAME rows, and the filter is
  a pure row-local predicate (no shuffle, fully pushed into the scan
  stage; the classic Bernoulli-per-stratum design).
- **Sequence packing (contiguous token chunking)** — assign documents to
  fixed-token-budget training sequences by a running token total within
  each group. One window per stratum (single shuffle on the stratum key);
  deterministic doc_id order. This is chunked first-fit over a defined
  order — the oracle-checkable core of packing; true bin-packing
  reorderings are heuristics layered on the same cumsum.
- **Benchmark contamination check** — flag corpus documents whose k-word
  shingle sets overlap an evaluation/benchmark set. Inverted-index join
  on 32-bit shingle hashes: the benchmark side is tiny by definition →
  broadcast; cost is O(corpus shingles), never corpus × benchmark.

The reference has no sampling surface (SURVEY §2.4: no TABLESAMPLE in its
parser) — these are north-star extensions per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ranger_spark.operators.dedup import base_hash32, shingle_df

# 60-bit md5-uniform denominator (fits signed 64; see cross-engine notes:
# DuckDB equivalent is ('0x' || substr(md5(...), 1, 15))::BIGINT)
_UNIFORM_DENOM = 1 << 60


def uniform_hash60(col: Column, seed: str = "samp") -> Column:
    """Deterministic 60-bit uniform hash of a column (md5-based, so the
    DuckDB oracle computes the identical value)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    seed: str = "samp",
) -> DataFrame:
    """Keep ~rate of rows, chosen deterministically by id hash. Applied
    after a groupBy-free filter, the per-stratum rate is automatic: the
    hash is independent of any stratum column, so each stratum retains
    ~rate of its rows (exact Bernoulli). Integer threshold compare —
    no float equality across engines."""
    threshold = int(rate * _UNIFORM_DENOM)
    return df.filter(uniform_hash60(F.col(id_col), seed) < F.lit(threshold))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each document a (seq_id, seq_offset) inside its group:
    documents are laid out in id order and cut into contiguous chunks
    whose token budget is ``budget`` — seq_id = floor(exclusive-cumsum /
    budget). Adds ``seq_id`` and ``seq_offset`` (token offset within the
    running layout). One window shuffle keyed on the group columns; at
    100 TB the stratum (e.g. language × source) bounds window state."""
    from pyspark.sql import Window

    parts = group_cols or []
    w = (
        Window.partitionBy(*parts).orderBy(F.col(id_col))
        if parts
        else Window.partitionBy(F.lit(1)).orderBy(F.col(id_col))
    )
    cum_excl = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn("seq_offset", cum_excl.cast("long")).withColumn(
        "seq_id", F.floor(F.col("seq_offset") / F.lit(budget)).cast("long")
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    min_overlap_frac: float = 0.2,
) -> DataFrame:
    """Fraction of each corpus document's distinct k-shingles that appear
    anywhere in the benchmark set; rows with overlap ≥ threshold are the
    contamination report. The benchmark shingle-hash set is distinct-ed
    and broadcast (eval sets are small); the corpus pays one shingle pass
    and one groupBy(id) — O(corpus tokens), no pair join."""
    c_sh = shingle_df(corpus, id_col, text_col, shingle_k)
    b_sh = F.broadcast(
        benchmark.select(F.col(text_col))
        .transform(lambda d: shingle_df(d.withColumn("__bid", F.lit(0)), "__bid", text_col, shingle_k))
        .select("sh_hash")
        .distinct()
    )
    flagged = c_sh.join(b_sh, "sh_hash", "left_semi")
    n_shared = flagged.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shared"))
    n_total = c_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    return (
        n_total.join(n_shared, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            "n_sh",
            F.round(
                F.coalesce(F.col("n_shared"), F.lit(0))
                / F.col("n_sh").cast("double"),
                6,
            ).alias("overlap_frac"),
        )
        .filter(F.col("overlap_frac") >= min_overlap_frac)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: each row lands in exactly one
    named bucket according to its md5-uniform hash and the cumulative
    fraction ranges. Row-local (no shuffle), rerun-stable, and adding
    rows never moves existing rows between splits — the properties a
    100 TB corpus split must have (re-splitting under growth would leak
    eval data into training)."""
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1.0")
    h = uniform_hash60(F.col(id_col), seed)
    expr = None
    cum = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        cond = h < F.lit(int(cum * _UNIFORM_DENOM))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def pack_sequences_ffd(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """True bin packing (first-fit-decreasing) per stratum via
    applyInPandas: docs sorted by token count desc (id tiebreak) are
    placed into the first open sequence with room, so every sequence
    except stragglers is ≤ budget — tighter than contiguous chunking when
    doc lengths vary. Deterministic given the sort, but inherently
    order-dependent, hence no SQL oracle (tests assert the invariants).
    Each stratum's state is a bin table in one python worker — at 100 TB
    the stratum (language × source × shard) must bound group size, the
    same contract as any applyInPandas stateful op."""
    import pandas as pd

    parts = group_cols or []
    schema_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
    )
    out_schema = f"{schema_fields}, seq_id long, seq_fill long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        seq_ids = []
        seq_fill = []
        for tok in pdf[token_col]:
            placed = False
            for i, f in enumerate(fills):
                if f + tok <= budget:
                    fills[i] = f + tok
                    seq_ids.append(i)
                    seq_fill.append(fills[i])
                    placed = True
                    break
            if not placed:
                fills.append(tok)
                seq_ids.append(len(fills) - 1)
                seq_fill.append(tok)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_fill"] = pd.Series(seq_fill, dtype="int64")
        return pdf

    if parts:
        return df.groupBy(*parts).applyInPandas(pack, out_schema)
    one = df.withColumn("__g", F.lit(1))
    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in one.schema.fields
        )
        + ", seq_id long, seq_fill long"
    )
    return one.groupBy("__g").applyInPandas(pack, out_schema).drop("__g")


def fuzzy_contamination(
    df,
    id_col: str,
    text_col: str,
    train_frac: float = 0.8,
    shingle_k: int = 2,
    threshold: float = 0.05,
    seed: str = "split",
):
    """FUZZY train/test contamination: near-duplicate pairs that straddle
    the hash-split boundary — the leak an exact-match contamination check
    (contamination_check) misses when eval text is lightly paraphrased.

    Plan: deterministic split (row-local, no shuffle) → distinct word
    shingles per doc → inverted-index equi-join on shingle hash with the
    train side left / test side right → exact Jaccard filter. Cost is
    Σ_shingle df_train·df_test, never |train|×|test|; at 100 TB the
    shingle join is the same banded/blocked shape as the dedup pipeline
    and the split predicate prunes each side before the join."""
    from pyspark.sql import functions as F

    from ranger_spark.operators.dedup import shingle_df

    split = hash_split(df, id_col, {"train": train_frac, "test": 1 - train_frac}, seed)
    sh = shingle_df(df, id_col, text_col, shingle_k).join(
        split.select(id_col, "split"), id_col
    )
    a = sh.filter(F.col("split") == "train").select(
        F.col(id_col).alias("train_id"), "sh_hash"
    )
    b = sh.filter(F.col("split") == "test").select(
        F.col(id_col).alias("test_id"), "sh_hash"
    )
    inter = (
        a.join(b, "sh_hash")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("train_id"), F.col("n_sh").alias("n_a")),
            "train_id",
        )
        .join(
            sizes.select(F.col(id_col).alias("test_id"), F.col("n_sh").alias("n_b")),
            "test_id",
        )
        .select(
            "train_id",
            "test_id",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    seed: str = "wsamp",
) -> DataFrame:
    """Deterministic weighted Bernoulli: keep a row iff its md5-uniform
    hash falls below weight × 2^60, so P(keep) equals the row's weight
    (clamped to [0, 1]) — the quality-weighted downsampling step of a
    pretraining pipeline, reproducible across runs and engines. The
    threshold goes through an explicit floor() (Spark's double→long cast
    truncates, DuckDB's rounds — floor on both sides keeps the oracle
    exact). Map-only."""
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight))
    threshold = F.floor(w * F.lit(float(_UNIFORM_DENOM))).cast("long")
    return df.filter(uniform_hash60(F.col(id_col), seed) < threshold)


def dsir_logratio_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    dim: int = 512,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed-unigram bag-of-
    words models of the target slice vs the raw pool, each document in
    the pool scored by its mean per-token log importance ratio
    ln(p_target(b)/p_raw(b)) with add-one smoothing over ``dim`` hashed
    buckets. Positive ⇒ target-like; downstream selection is a filter or
    weighted sample over the score.

    Scale shape: one token explode shuffling (id, small-int bucket); the
    bucket histogram is dim rows (map-side combined), its log-ratio table
    and the 1-row totals broadcast back — the corpus is never shuffled as
    text, and nothing grows with corpus size except the single explode.
    """
    from ranger_spark.operators.text import hash64, normalize_text, tokenize

    toks = (
        df.select(
            F.col(id_col),
            is_target.alias("__is_t"),
            F.explode(tokenize(normalize_text(F.col(text_col)))).alias("__t"),
        )
        .filter(F.length("__t") > 0)
        .select(
            id_col,
            "__is_t",
            F.pmod(hash64(F.col("__t"), seed="d"), F.lit(dim)).alias("__b"),
        )
    )
    hist = toks.groupBy("__b").agg(
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("__tb"),
        F.sum(F.when(F.col("__is_t"), 0).otherwise(1)).alias("__rb"),
    )
    tot = hist.agg(
        F.sum("__tb").alias("__T"), F.sum("__rb").alias("__R")
    )
    lam = hist.crossJoin(F.broadcast(tot)).select(
        "__b",
        (
            F.log((F.col("__tb") + 1.0) / (F.col("__T") + float(dim)))
            - F.log((F.col("__rb") + 1.0) / (F.col("__R") + float(dim)))
        ).alias("__lam"),
    )
    return (
        toks.filter(~F.col("__is_t"))
        .join(F.broadcast(lam), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # "+ 0.0" canonicalizes IEEE -0.0 to +0.0 (a doc whose
            # ratios cancel rounds to negative zero on one engine and
            # positive on the other — sf0.1 sweep catch, r9); the oracle
            # carries the same "+ 0".
            (F.round(F.avg("__lam"), 6) + F.lit(0.0)).alias("dsir_logratio"),
        )
    )
