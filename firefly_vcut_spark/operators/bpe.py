"""Distributed BPE (byte-pair encoding) tokenizer training — Sennrich
et al., "Neural Machine Translation of Rare Words with Subword Units"
(ACL'16) — as a Spark driver loop of scan-shaped rounds.

Representation trick that makes the whole trainer engine-portable:
a word's symbol sequence is kept as the string ``' s1  s2  s3 '`` —
every symbol wrapped in its OWN leading and trailing space. Merging
pair (a, b) into ab is then the plain string
``replace(rep, ' a  b ', ' ab ')``: built-in replace is left-to-right
and non-overlapping in Spark and DuckDB alike, which is exactly BPE's
merge semantics (``[a,a,a]`` merges the first two), and the wrapped
spaces keep adjacent matches independent (``[x,a,b,a,b]`` merges
both). No UDF, no per-row Python — the V training rounds are V
(projection + 2-level aggregate + take(1)) jobs over a cached word-
frequency table.

Scale shape: the word-frequency table is vocab-bounded (Zipf: even at
100 TB the distinct-word table is tiny next to the corpus), built by
ONE token aggregation that shuffles (word, count) pairs, never text.
Each round is a map-side pair explode off that cached table plus a
pair-keyed aggregate (key space O(vocab·word_len), partial-agg
combined map-side) and one take(1) argmax. The merge table — the
actual tokenizer artifact — is V rows of driver state, a plan
literal for the encode side."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized whitespace tokens — the
    vocab-bounded input BPE trains on."""
    from firefly_vcut_spark.operators.text import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_rep(word: Column) -> Column:
    """Character-split start state in the wrapped-spaces form:
    'the' → ' t  h  e '."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))


def merged_rep(rep: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply an ordered merge list to a wrapped-spaces rep column —
    one chained literal replace per merge, all codegen."""
    for a, b in merges:
        rep = F.replace(
            rep, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
        )
    return rep


def _pair_counts(words: DataFrame, rep: Column) -> DataFrame:
    """(pair 'a b', w) — every adjacent symbol position weighted by
    the word's corpus frequency (subword-nmt counts positions, not
    distinct pairs per word)."""
    syms = F.split(F.trim(rep), "  ")
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat(
                F.element_at(syms, i), F.lit(" "), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("w"))
    )


def train_bpe(
    words: DataFrame, num_merges: int
) -> list[dict]:
    """Run ``num_merges`` BPE rounds; returns the ordered merge table
    [{rank, a, b, merged, weight}]. Deterministic: the argmax pair is
    tie-broken lexicographically, so any engine replaying the rounds
    (the DuckDB oracle unrolls them as CTEs) derives the identical
    table. Stops early when no adjacent pair remains."""
    words = words.persist()
    try:
        merges: list[dict] = []
        pair_list: list[tuple[str, str]] = []
        rep = initial_rep(F.col("word"))
        for rank in range(1, num_merges + 1):
            best = (
                _pair_counts(words, merged_rep(rep, pair_list))
                .orderBy(F.desc("w"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b = best[0]["pair"].split(" ")
            pair_list.append((a, b))
            merges.append(
                {
                    "rank": rank,
                    "a": a,
                    "b": b,
                    "merged": a + b,
                    "weight": int(best[0]["w"]),
                }
            )
        return merges
    finally:
        words.unpersist()


def vocab_stats(
    words: DataFrame, merges: list[dict]
) -> DataFrame:
    """Corpus symbol statistics AFTER applying the learned merges:
    (symbol, total_freq, n_words) — the tokenizer's effective vocab
    usage. One projection + explode + aggregate."""
    rep = merged_rep(
        initial_rep(F.col("word")), [(m["a"], m["b"]) for m in merges]
    )
    syms = F.split(F.trim(rep), "  ")
    return (
        words.select("word", "freq", F.explode(syms).alias("symbol"))
        .groupBy("symbol")
        .agg(
            F.sum("freq").cast("long").alias("total_freq"),
            F.countDistinct("word").cast("long").alias("n_words"),
        )
    )


def encode_piece_counts(
    docs: DataFrame, words: DataFrame, merges: list[dict]
) -> DataFrame:
    """Apply the learned merge table corpus-wide: per-doc whitespace
    token and BPE piece counts — the tokens-per-document statistic a
    training pipeline shards and budgets by.

    Scale: the per-WORD piece count is computed once on the vocab-
    bounded word table (chained literal replaces, pure projection)
    and BROADCAST; the corpus side is one explode + broadcast join +
    doc-keyed aggregate. Text never shuffles — only (word, n_pieces)
    and (doc_id, counts)."""
    from firefly_vcut_spark.operators.text import tokens

    rep = merged_rep(
        initial_rep(F.col("word")), [(m["a"], m["b"]) for m in merges]
    )
    word_pieces = words.select(
        "word", F.size(F.split(F.trim(rep), "  ")).cast("long").alias("n_pieces")
    )
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    return (
        toks.join(F.broadcast(word_pieces), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
        )
    )
