"""BPE tokenizer training as registry queries with full DuckDB
oracles: the V training rounds are UNROLLED into CTEs (the same
replay technique as the pagerank/graph oracles), so the argmax pair
of every round — and therefore the whole learned merge table — is
engine-verified, not just row-counted.

Reference scope note: the reference counts tokens only implicitly
(lyric lines, fuzz.py); a trainable subword tokenizer is part of this
repo's LLM-training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_V = 12  # merge rounds
_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


def _rounds_cte(v: int) -> str:
    """w0 → r0 → (p_i, b_i, r_i) × v — one CTE chain both queries
    share. b_i is round i's argmax pair; r_i the corpus rep after
    applying it (wrapped-spaces replace, see operators/bpe.py)."""
    parts = [
        f"""w0 AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT doc_id, unnest({_TOKS}) AS word FROM documents)
        WHERE word != '' GROUP BY word
    ),
    r0 AS MATERIALIZED (
        SELECT word, freq,
               ' ' || array_to_string(
                   list_filter(string_split(word, ''), c -> c != ''),
                   '  ') || ' ' AS rep
        FROM w0
    )"""
    ]
    for i in range(1, v + 1):
        parts.append(
            f"""p{i} AS MATERIALIZED (
        SELECT pair, CAST(sum(freq) AS BIGINT) AS w FROM (
            SELECT freq,
                   unnest(list_transform(range(1, len(s)),
                                         j -> s[j] || ' ' || s[j + 1])) AS pair
            FROM (SELECT freq, string_split(trim(rep), '  ') AS s FROM r{i - 1})
        ) GROUP BY pair
    ),
    b{i} AS MATERIALIZED (SELECT pair, w FROM p{i} ORDER BY w DESC, pair ASC LIMIT 1),
    r{i} AS MATERIALIZED (
        SELECT word, freq,
               replace(rep,
                       ' ' || split_part(pair, ' ', 1) || '  '
                           || split_part(pair, ' ', 2) || ' ',
                       ' ' || replace(pair, ' ', '') || ' ') AS rep
        FROM r{i - 1} CROSS JOIN b{i}
    )"""
        )
    return ",\n    ".join(parts)


def _merges_sql(v: int) -> str:
    rows = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, pair, "
        f"replace(pair, ' ', '') AS merged, w AS weight FROM b{i}"
        for i in range(1, v + 1)
    )
    return f"""
    WITH {_rounds_cte(v)}
    SELECT * FROM (
    {rows}
    ) ORDER BY rank
    """


def _vocab_sql(v: int) -> str:
    return f"""
    WITH {_rounds_cte(v)}
    SELECT symbol,
           CAST(sum(freq) AS BIGINT) AS total_freq,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words
    FROM (SELECT word, freq, unnest(string_split(trim(rep), '  ')) AS symbol
          FROM r{v})
    GROUP BY symbol
    ORDER BY total_freq DESC, symbol ASC
    LIMIT 50
    """


def _trained(spark: SparkSession, sf_dir: str):
    from firefly_vcut_spark.operators.bpe import train_bpe, word_freq_table

    words = word_freq_table(load_table(spark, sf_dir, "documents"))
    return words, train_bpe(words, _V)


@query(
    "text_bpe_merges",
    sql=_merges_sql(_V),
    tags=("text", "extension", "tokenizer", "iterative"),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE training (Sennrich'16): V=12 merge rounds over
    the vocab-bounded word-frequency table, each round one scan-shaped
    pair aggregate + take(1) argmax (lexicographic tie-break). Output
    is the learned merge table itself; the oracle re-derives every
    round's argmax via unrolled CTEs, so a single wrong merge anywhere
    in the sequence breaks the hash."""
    spark_, merges = _trained(spark, sf_dir)
    return spark.createDataFrame(
        [
            (m["rank"], f"{m['a']} {m['b']}", m["merged"], m["weight"])
            for m in merges
        ],
        schema="rank long, pair string, merged string, weight long",
    ).orderBy("rank")


def _encode_sql(v: int) -> str:
    return f"""
    WITH {_rounds_cte(v)},
    wp AS (
        SELECT word,
               CAST(len(string_split(trim(rep), '  ')) AS BIGINT) AS n_pieces
        FROM r{v}
    ),
    toks AS (
        SELECT doc_id, unnest({_TOKS}) AS word FROM documents
    )
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(wp.n_pieces) AS BIGINT) AS n_pieces
    FROM toks t JOIN wp USING (word)
    WHERE t.word != ''
    GROUP BY t.doc_id
    """


@query(
    "text_bpe_encode_docs",
    sql=_encode_sql(_V),
    tags=("text", "extension", "tokenizer"),
)
def text_bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide encode with the learned merges: per-doc whitespace
    token vs BPE piece counts — the budget statistic sharding and
    sequence packing run on. Word piece-lengths come off the vocab-
    bounded table and broadcast; the corpus side is one explode +
    broadcast join + doc aggregate (text never shuffles)."""
    from firefly_vcut_spark.operators.bpe import encode_piece_counts

    docs = load_table(spark, sf_dir, "documents")
    words, merges = _trained(spark, sf_dir)
    return encode_piece_counts(docs, words, merges)


@query(
    "text_bpe_vocab_stats",
    sql=_vocab_sql(_V),
    tags=("text", "extension", "tokenizer"),
)
def text_bpe_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus symbol usage after applying the learned BPE merges:
    top-50 symbols by merged-corpus frequency. The encode side of the
    tokenizer — the merge table is a plan literal (chained literal
    replaces, pure codegen), the stats one explode + aggregate."""
    from firefly_vcut_spark.operators.bpe import vocab_stats

    words, merges = _trained(spark, sf_dir)
    return (
        vocab_stats(words, merges)
        .orderBy(F.desc("total_freq"), F.asc("symbol"))
        .limit(50)
    )
