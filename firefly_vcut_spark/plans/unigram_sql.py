"""Unigram-LM (SentencePiece-style) tokenizer as registry queries
with full DuckDB oracles.

The oracle replays BOTH stages closed-form:

- the seed-vocabulary fit (all-substring weights, keep-all single
  chars + integer-tie-stable top-K multis, micro-nat costs), and
- the exact Viterbi decode, UNROLLED into one CTE per prefix length
  (``d1..d{MAX_WORD_LEN}``, each MATERIALIZED): stage i joins the best
  states at positions i-4..i-1 against the piece table on the literal
  substring and keeps the (cost, n, seg)-min row per word — the same
  per-position pruning the Spark HOF dp performs, so a single wrong
  DP cell anywhere flips the hash. This is the BPE/k-means unrolled-
  replay technique (`plans/bpe_sql.py`, `plans/kmeans_sql.py`) applied
  to a dynamic program.

Engine-parity notes: all weights/costs/sums are BIGINT (costs are
``round(ln(total/weight)*1e6)`` micro-nats — the DSIR quantization);
tie-breaks are (cost, n, seg) with seg built identically on both
sides, and ``seg``-string comparison is prefix-monotonic for
equal-coverage states (module docstring of ``operators/unigram.py``).

Reference scope note: the reference (firefly-vcut) has no tokenizer;
this is the training-data surface the brief adds (tokenizer family,
alongside BPE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firefly_vcut_spark.operators.unigram import (
    K_MULTI,
    MAX_PIECE_LEN,
    MAX_WORD_LEN,
    encode_docs,
    em_rescore,
    fit_em_pieces,
    fit_pieces,
    piece_scores,
    viterbi_words,
)
from firefly_vcut_spark.plans.registry import query
from firefly_vcut_spark.sources.catalog import load_table

_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


def _pieces_cte(k: int = K_MULTI, maxp: int = MAX_PIECE_LEN) -> str:
    """w0 -> spans -> sel -> pieces: the seed-vocabulary fit."""
    return f"""w0 AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest({_TOKS}) AS word FROM documents)
        WHERE word != '' GROUP BY word
    ),
    spans AS MATERIALIZED (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS weight FROM (
            SELECT freq,
                   unnest(list_transform(range(1, length(word) - l + 2),
                                         s -> substr(word, s, l))) AS piece
            FROM w0, (SELECT unnest(range(1, {maxp + 1})) AS l) ll
            WHERE length(word) >= l
        ) GROUP BY piece
    ),
    sel AS MATERIALIZED (
        SELECT piece, weight FROM spans WHERE length(piece) = 1
        UNION ALL
        SELECT piece, weight FROM (
            SELECT piece, weight FROM spans WHERE length(piece) >= 2
            ORDER BY weight DESC, piece ASC LIMIT {k}
        )
    ),
    pieces AS MATERIALIZED (
        SELECT piece, weight,
               CAST(round(ln(CAST(tw AS DOUBLE) / weight) * 1000000)
                    AS BIGINT) AS cost
        FROM sel CROSS JOIN
             (SELECT CAST(sum(weight) AS BIGINT) AS tw FROM sel) tot
    )"""


def _viterbi_ctes(
    maxw: int = MAX_WORD_LEN,
    maxp: int = MAX_PIECE_LEN,
    prefix: str = "d",
    pieces: str = "pieces",
    enc: str = "enc",
) -> str:
    """{prefix}0..{prefix}{maxw} + {enc}: the unrolled exact-DP replay
    against the ``pieces`` vocabulary CTE. {prefix}{i} holds the single
    best (cost, n, seg) state covering each word's length-i prefix;
    {enc} joins each word to the state at its full length. The prefix
    parameter lets one query chain TWO decodes (seed model, then the
    hard-EM re-estimated model) without CTE-name collisions."""
    d = prefix
    parts = [
        f"{d}0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS cost, "
        "CAST(0 AS BIGINT) AS n, '' AS seg FROM w0)"
    ]
    for i in range(1, maxw + 1):
        prevs = "\n            UNION ALL ".join(
            f"SELECT word, cost, n, seg, CAST({j} AS BIGINT) AS pos FROM {d}{j}"
            for j in range(max(0, i - maxp), i)
        )
        parts.append(
            f"""{d}c{i} AS (
        SELECT d.word, d.cost + p.cost AS cost, d.n + 1 AS n,
               CASE WHEN d.seg = '' THEN p.piece
                    ELSE d.seg || ' ' || p.piece END AS seg
        FROM ({prevs}) d
        JOIN {pieces} p ON p.piece = substr(d.word, d.pos + 1, {i} - d.pos)
        WHERE length(d.word) >= {i}
    ),
    {d}{i} AS MATERIALIZED (
        SELECT word, cost, n, seg FROM (
            SELECT *, row_number() OVER (PARTITION BY word
                         ORDER BY cost, n, seg) AS rn
            FROM {d}c{i}
        ) WHERE rn = 1
    )"""
        )
    final = "\n        UNION ALL ".join(
        f"SELECT w.word, w.freq, d.cost, d.n, d.seg FROM w0 w "
        f"JOIN {d}{i} d USING (word) WHERE length(w.word) = {i}"
        for i in range(1, maxw + 1)
    )
    parts.append(f"{enc} AS MATERIALIZED (\n        {final}\n    )")
    return ",\n    ".join(parts)


def _rescore_ctes(pieces2: str = "pieces2", enc: str = "enc") -> str:
    """used + {pieces2}: the hard-EM re-estimation off a decode CTE —
    piece usage weighted by word frequency, re-scored to micro-nats.
    Totality of a second decode holds by construction: every word's
    round-1 pieces are all in {pieces2}."""
    return f"""used AS (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS used_weight
        FROM (SELECT freq, unnest(string_split(seg, ' ')) AS piece FROM {enc})
        GROUP BY piece
    ),
    {pieces2} AS MATERIALIZED (
        SELECT piece, used_weight,
               CAST(round(ln(CAST(tw AS DOUBLE) / used_weight) * 1000000)
                    AS BIGINT) AS cost
        FROM used CROSS JOIN
             (SELECT CAST(sum(used_weight) AS BIGINT) AS tw FROM used) tot
    )"""


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firefly_vcut_spark.operators.bpe import word_freq_table

    return word_freq_table(load_table(spark, sf_dir, "documents"))


@query(
    "text_unigram_piece_scores",
    sql=f"""
    WITH {_pieces_cte()}
    SELECT piece, weight, cost AS cost_micro FROM pieces
    """,
    tags=("text", "extension", "tokenizer"),
)
def text_unigram_piece_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed unigram vocabulary (Kudo'18 §3.2): every single char plus
    the top-64 multi-char substrings by integer (weight, piece) order,
    scored in micro-nats. One substring explode off the vocab-bounded
    word table — the corpus itself is touched only by the shared
    (word, count) tokenization shuffle."""
    return piece_scores(_words(spark, sf_dir))


@query(
    "text_unigram_encode_words",
    sql=f"""
    WITH {_pieces_cte()},
    {_viterbi_ctes()}
    SELECT word, CAST(freq AS BIGINT) AS freq,
           CAST(cost AS BIGINT) AS cost_micro,
           CAST(n AS BIGINT) AS n_pieces, seg
    FROM enc
    """,
    tags=("text", "extension", "tokenizer", "iterative"),
)
def text_unigram_encode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Viterbi segmentation of every corpus word under the seed
    model — the DP runs inside one JVM HOF expression with the piece
    table as a literal map (zero shuffle, zero Python), and the oracle
    re-derives every DP cell via the 12-stage unrolled CTE. The output
    carries the argmin PATH (seg), not just its cost, so a tie-break
    or transition bug anywhere in either engine flips the hash."""
    w = _words(spark, sf_dir)
    return viterbi_words(w, fit_pieces(w))


@query(
    "text_unigram_em_rescore",
    sql=f"""
    WITH {_pieces_cte()},
    {_viterbi_ctes()},
    {_rescore_ctes()}
    SELECT piece, used_weight, cost AS new_cost_micro FROM pieces2
    """,
    tags=("text", "extension", "tokenizer", "iterative"),
)
def text_unigram_em_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hard-EM re-estimation round: piece usage under the Viterbi
    decode (frequency-weighted), re-scored to fresh micro-nat costs;
    never-used pieces drop out. Verifies the fit->decode->refit loop
    end-to-end — the oracle replays the seed fit AND the full DP
    before it can even count usages."""
    w = _words(spark, sf_dir)
    return em_rescore(viterbi_words(w, fit_pieces(w)))


@query(
    "text_unigram_em_reencode",
    sql=f"""
    WITH {_pieces_cte()},
    {_viterbi_ctes()},
    {_rescore_ctes()},
    {_viterbi_ctes(prefix="e", pieces="pieces2", enc="enc2")}
    SELECT word, CAST(freq AS BIGINT) AS freq,
           CAST(cost AS BIGINT) AS cost_micro,
           CAST(n AS BIGINT) AS n_pieces, seg
    FROM enc2
    """,
    tags=("text", "extension", "tokenizer", "iterative"),
)
def text_unigram_em_reencode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-2 decode: every corpus word re-segmented under the
    hard-EM re-estimated model (fit -> decode -> refit -> decode, the
    full unigram-LM training loop once around). The oracle replays the
    seed fit, the 12-stage DP, the usage re-score, AND a second
    12-stage DP over the shrunken vocabulary — 24 unrolled DP stages
    end-to-end. Totality of the second decode holds by construction
    (every word's round-1 pieces survive into pieces2). Spark side:
    the round-1 decode collapses into the bounded-model fit (two
    vocab-table jobs); the round-2 decode is the same zero-shuffle
    literal-map projection as round 1."""
    w = _words(spark, sf_dir)
    return viterbi_words(w, fit_em_pieces(w))


@query(
    "text_unigram_encode_docs",
    sql=f"""
    WITH {_pieces_cte()},
    {_viterbi_ctes()},
    toks AS (SELECT doc_id, unnest({_TOKS}) AS word FROM documents)
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(e.n) AS BIGINT) AS n_pieces,
           CAST(sum(e.cost) AS BIGINT) AS cost_micro
    FROM toks t JOIN enc e ON e.word = t.word
    WHERE t.word != ''
    GROUP BY t.doc_id
    """,
    tags=("text", "extension", "tokenizer"),
)
def text_unigram_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level unigram encode: tokens join the BROADCAST
    vocab-bounded word-encode projection, then ONE doc-keyed rollup —
    document text never re-shuffles, mirroring text_bpe_encode_docs'
    scale shape. Words beyond MAX_WORD_LEN fall out of the inner join
    identically on both engines."""
    d = load_table(spark, sf_dir, "documents")
    w = _words(spark, sf_dir)
    enc = viterbi_words(w, fit_pieces(w))
    return encode_docs(d, enc)


def _fertility_sql() -> str:
    """Both trainers re-derived, side by side: the BPE branch nests
    the 12-round unrolled merge replay (plans/bpe_sql.py), the unigram
    branch nests the seed fit + 12-stage DP — each as a derived table
    with its own WITH scope, so the shared CTE names (w0 ...) never
    collide. Fertility compares on the SAME word set (length <=
    MAX_WORD_LEN, the unigram decode bound)."""
    from firefly_vcut_spark.plans.bpe_sql import _V, _rounds_cte

    bpe = f"""WITH {_rounds_cte(_V)}
        SELECT word, freq,
               CAST(len(string_split(trim(rep), '  ')) AS BIGINT) AS n
        FROM r{_V} WHERE length(word) <= {MAX_WORD_LEN}"""
    uni = f"""WITH {_pieces_cte()},
        {_viterbi_ctes()}
        SELECT word, freq, n FROM enc"""
    branch = """
        SELECT '{name}' AS tokenizer,
               CAST(sum(freq) AS BIGINT) AS n_words,
               CAST(sum(freq * n) AS BIGINT) AS total_pieces,
               round(CAST(sum(freq * n) AS DOUBLE) / sum(freq), 6)
                   AS pieces_per_word
        FROM ({sql})"""
    return (
        branch.format(name="bpe", sql=bpe)
        + "\n    UNION ALL\n"
        + branch.format(name="unigram", sql=uni)
    )


@query(
    "text_tokenizer_fertility_compare",
    sql=_fertility_sql(),
    tags=("text", "extension", "tokenizer", "eval", "iterative"),
)
def text_tokenizer_fertility_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-family capstone eval: corpus fertility (frequency-
    weighted pieces per word) of the 12-merge BPE tokenizer vs the
    seed-fit unigram-LM tokenizer, on the identical word set — the
    number a pipeline compares before picking its tokenizer (lower
    fertility = shorter sequences = cheaper training). The oracle
    re-derives BOTH trainers from scratch: all 12 BPE merge argmaxes
    AND the unigram fit + full Viterbi DP, then both rollups — a
    regression in either trainer anywhere flips the hash.

    Scale: both branches share the one corpus tokenization shuffle
    shape (vocab-bounded word tables); the comparison itself is two
    2-column rollups and a 2-row union."""
    from firefly_vcut_spark.operators.bpe import rep_table, train_bpe, word_freq_table

    docs = load_table(spark, sf_dir, "documents")
    words = word_freq_table(docs)
    merges = train_bpe(words, 12)
    reps = rep_table(words, [(m["a"], m["b"]) for m in merges]).filter(
        F.length("word") <= MAX_WORD_LEN
    )
    bpe = reps.select(
        "freq", F.size(F.split(F.trim("rep"), "  ")).cast("long").alias("n")
    )
    uni = viterbi_words(words, fit_pieces(words)).select(
        "freq", F.col("n_pieces").alias("n")
    )

    def rollup(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.sum("freq").cast("long").alias("n_words"),
            F.sum(F.col("freq") * F.col("n")).cast("long").alias("total_pieces"),
            F.round(
                F.sum(F.col("freq") * F.col("n")).cast("double") / F.sum("freq"), 6
            ).alias("pieces_per_word"),
        ).select(F.lit(name).alias("tokenizer"), "n_words", "total_pieces", "pieces_per_word")

    return rollup(bpe, "bpe").unionByName(rollup(uni, "unigram"))
