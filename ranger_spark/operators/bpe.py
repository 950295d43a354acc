"""Distributed BPE vocabulary induction — train byte-pair-encoding
merges on a corpus (Sennrich et al. 2016), the tokenizer-training step of
an LLM data pipeline (no reference analog; north-star extension).

Algorithm: classic BPE over the word-frequency table. Words are
represented as symbol strings with each symbol wrapped in pipes
(``cat → |c||a||t|``); a merge of pair (a, b) is then exactly
``replace(repr, '|a||b|', '|ab|')`` — string replace is left-to-right
and non-overlapping in Spark, DuckDB, and Python alike, which IS BPE's
greedy merge order (``|a||a||a|`` merges once, not twice). That shared
primitive is what lets the DuckDB oracle replay training bit-for-bit.

Scale shape: the corpus is touched ONCE (word-count aggregate,
vocabulary-bounded output with map-side combine). Each merge round is
pairs-explode → one aggregate over the vocabulary table → a 1-row
argmax collected to the driver (the model parameter being learned —
a legitimate scalar collect) → a map-only replace. Lineage is
truncated per round with localCheckpoint so N rounds stay O(N) not
O(N²). At 100 TB the vocabulary table (not the corpus) bounds every
round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ranger_spark.operators.text import normalize_text, tokenize


def _symbols(repr_col):
    """'|c||a||t|' → ['c','a','t']."""
    inner = F.expr(
        f"substring({repr_col}, 2, length({repr_col}) - 2)"
    )
    return F.split(inner, r"\|\|")


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus.

    Returns one row per learned merge: (merge_rank, pair_a, pair_b,
    merged, pair_count) — rank is 1-based training order, pair_count the
    frequency-weighted count that won the round (ties broken by
    (count desc, pair_a asc, pair_b asc) so training is deterministic
    across engines)."""
    spark = df.sparkSession
    toks = tokenize(normalize_text(F.col(text_col)))
    words = (
        df.select(F.explode(toks).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat(
                F.lit("|"),
                F.array_join(F.split(F.col("w"), ""), "||"),
                F.lit("|"),
            ).alias("r"),
            "freq",
        )
    )
    words = words.localCheckpoint(eager=False)
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        syms = _symbols("r")
        n = F.size(syms)
        pairs = words.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice(syms, 1, n - 1).alias("a"),
                    F.slice(syms, 2, n - 1).alias("b"),
                )
            ).alias("z"),
        ).select(F.col("z.a").alias("a"), F.col("z.b").alias("b"), "freq")
        best = (
            pairs.filter(F.col("b").isNotNull())
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((rank, a, b, a + b, c))
        words = words.withColumn(
            "r",
            F.replace(
                F.col("r"), F.lit(f"|{a}||{b}|"), F.lit(f"|{a + b}|")
            ),
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges,
        "merge_rank int, pair_a string, pair_b string, "
        "merged string, pair_count long",
    )


def bpe_oracle_sql(n_merges: int = 8, toks_sql: str | None = None) -> str:
    """Generate the DuckDB oracle that replays BPE training: one CTE
    level per merge round, each computing the weighted pair counts,
    picking the same (count desc, pair asc) argmax, and applying the
    same pipe-wrapped string replace."""
    toks_sql = toks_sql or (
        "regexp_split_to_array(trim(regexp_replace(lower(text), "
        "'[^a-z0-9]+', ' ', 'g')), '\\s+')"
    )
    parts = [
        f"""w0 AS (
      SELECT '|' || array_to_string(string_split(w, ''), '||') || '|' AS r,
             count(*) AS freq
      FROM (SELECT unnest({toks_sql}) AS w FROM documents) u
      WHERE length(w) > 0
      GROUP BY w
    )"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        parts.append(
            f"""p{i} AS (
      SELECT s[j] AS a, s[j+1] AS b, CAST(sum(freq) AS BIGINT) AS c
      FROM (
        SELECT string_split(r[2:length(r)-1], '||') AS s, freq FROM {prev}
      ) t, LATERAL (
        SELECT unnest(generate_series(1, len(s) - 1)) AS j
      ) g
      GROUP BY 1, 2
    ),
    b{i} AS (SELECT a, b, c FROM p{i} ORDER BY c DESC, a, b LIMIT 1),
    w{i} AS (
      SELECT replace(r, '|' || b{i}.a || '||' || b{i}.b || '|',
                     '|' || b{i}.a || b{i}.b || '|') AS r, freq
      FROM {prev}, b{i}
    )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, a AS pair_a, b AS pair_b, "
        f"a || b AS merged, c AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + selects


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned merges (training order) to every document — the
    inference half of the tokenizer. Map-only: each merge is one
    string-replace over the pipe-wrapped symbol representation; the
    output is (id, n_words, n_bpe_tokens)."""
    toks = tokenize(normalize_text(F.col(text_col)))
    d = df.select(F.col(id_col), toks.alias("__toks"))
    word_repr = F.transform(
        F.col("__toks"),
        lambda w: F.concat(
            F.lit("|"), F.array_join(F.split(w, ""), "||"), F.lit("|")
        ),
    )
    d = d.withColumn("__reprs", word_repr)
    col = F.col("__reprs")
    for a, b in merges:
        col = F.transform(
            col, lambda r: F.replace(r, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
        )
    n_tokens = F.aggregate(
        col,
        F.lit(0),
        lambda acc, r: acc + F.size(F.split(r, r"\|\|")),
    )
    return d.select(
        id_col,
        F.size("__toks").alias("n_words"),
        n_tokens.alias("n_bpe_tokens"),
    )
