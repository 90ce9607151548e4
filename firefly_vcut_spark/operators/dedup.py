"""Deduplication operator family for large-scale corpus pipelines:
exact (hash group-by), MinHash+LSH banding, SimHash, n-gram Jaccard,
and embedding-cosine near-dup.

Scale design notes (each operator, at 100 TB):
- exact: one shuffle on a fixed-width digest, never on the text.
- minhash: signatures computed per-row (no shuffle), then ONE shuffle
  on (band_id, band_hash) buckets; candidate pairs only within
  buckets — never an all-pairs join.
- simhash: 64 bitplane aggregates per doc computed map-side from
  exploded tokens; near-dup candidates via 16-bit band buckets
  (Hamming ≤ 3 ⇒ at least one of 4 bands identical).
- ngram-jaccard: exact verification restricted to candidate pairs
  (blocked join), token sets exploded once and joined on token.
- embedding cosine: bucketed by a blocking key (label / LSH bucket),
  pairs only within buckets; cosine is pure-Column JVM math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from firefly_vcut_spark.functions.vectors import cosine
from firefly_vcut_spark.operators.skew import widen_if_narrow


def normalized_text(text: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace runs."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on an md5 digest of normalized text; keeps the
    lowest id per group (deterministic canonical representative).
    Shuffles 16-byte digests + ids, never the documents."""
    digest = F.md5(normalized_text(F.col(text_col)))
    return (
        docs.select(F.col(id_col), digest.alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles from whitespace-tokenized text; texts shorter
    than n words yield their single whole-text shingle."""
    words = F.split(normalized_text(text), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


# Portable hash family: integer arithmetic reproducible in any ANSI-SQL
# engine (used by the oracle-checked minhash variant; the default engine
# path keeps xxhash64 — better mixing, one JVM intrinsic per hash).
MINHASH_P = 1_000_000_007


def perm_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation coefficients (a_i, b_i) for the
    portable MinHash family h_i(x) = (a_i*x + b_i) mod P. a_i < P keeps
    a_i*x < 2^60 — no int64 overflow in either engine."""
    return [
        ((2654435761 * (i + 1)) % MINHASH_P, (40503 * (i + 7)) % MINHASH_P)
        for i in range(num_hashes)
    ]


def charfold_hash(s: Column) -> Column:
    """Polynomial rolling hash over a string's characters, mod P.
    Pure Column arithmetic — identical digits in Spark and DuckDB
    (verified incl. unicode), unlike xxhash64/md5-to-int."""
    chars = F.filter(F.split(s, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % MINHASH_P,
    )


def bucket_pairs(buckets: DataFrame, xs_col: str) -> DataFrame:
    """Explode each bucket array's C(n, 2) ordered element pairs as
    (_a, _b) rows via NESTED generators: posexplode picks element i,
    then that element's tail slice explodes in a second generator.

    The previous form — flatten(transform(xs, (a, i) -> transform(
    slice(...), b -> struct(a, b)))) fed to one explode — materialized
    the ENTIRE C(n, 2) struct array inside a single row before the
    generator ran: a degenerate hot bucket (e.g. one simhash band value
    shared by 100k near-empty docs) builds 5x10^9 structs in one row,
    OOM / 2 GB-array territory (guide §5). The nested form's peak row
    width is one tail slice — O(n) — and the pair stream is consumed
    incrementally by the downstream aggregation inside the same
    whole-stage-codegen span (verified: both Generates fuse, no new
    exchange). Pair SET is identical: elements taken in array order,
    _a strictly before _b."""
    xs = F.col(xs_col)
    headed = buckets.select(
        xs.alias("_xs"), F.posexplode(xs_col).alias("_i", "_a")
    )
    tail = F.slice(
        "_xs",
        F.col("_i") + F.lit(2),
        F.greatest(F.size("_xs") - F.col("_i") - F.lit(1), F.lit(0)),
    )
    return headed.select("_a", F.explode(tail).alias("_b"))


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for seed i, min over shingles of
    xxhash64(i, shingle) — one pass, no shuffle, JVM hash."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(i, s))
        ),
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-dup candidate pairs via LSH banding: docs sharing any band
    of their MinHash signature. Returns (id_a, id_b, n_shared_bands),
    id_a < id_b. The only shuffle is on band buckets.

    hash_mode "xxhash64" (default) is the engine path; "portable"
    swaps in the affine family over a char-fold shingle hash — same
    banding pipeline, integer arithmetic DuckDB can replay exactly,
    so the LSH join/grouping logic gets a full oracle check.

    Pair generation is bucket-array, not self-join: one shuffle on
    (band_id, band_hash) collects each bucket's sorted ids and the
    candidate pairs explode from the array in codegen (nested
    generators — see bucket_pairs for the hot-bucket memory bound). A
    self-join would run the whole signature pipeline (shingle explode ×
    num_hashes hash columns × min-agg) once PER SIDE; the bucket
    aggregation runs it once. CPU per bucket is C(|bucket|, 2) either
    way — near-dup buckets are small by construction."""
    banded = minhash_band_table(
        docs, text_col, id_col, num_hashes, bands, hash_mode
    ).select("id", F.explode("bands").alias("band")).select(
        "id", "band.band_id", "band.band_hash"
    )
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        bucket_pairs(buckets, "ids")
        .groupBy(F.col("_a").alias("id_a"), F.col("_b").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
    )


def minhash_band_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-doc banded MinHash signature: (id, bands) where bands is an
    array<struct<band_id int, band_hash long>> — the compact unit an
    LSH index stores per admitted doc (8 longs, never the text). Both
    the batch candidate join (minhash_lsh_candidates) and the
    streaming incremental dedup sink build on this."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands "
            f"({bands}); a truncated trailing band silently changes "
            "LSH sensitivity"
        )
    rows_per_band = num_hashes // bands
    # Signature via explode + N flat hash columns + map-side MIN agg:
    # ~3× faster than the nested higher-order-function form
    # (transform-over-seeds × transform-over-shingles allocates arrays
    # per row and stays outside codegen); the flat columns compile to
    # one codegen stage and the mins combine map-side. Widen a narrow
    # (small single-file) scan so it doesn't serialize the hash
    # fan-out; at scale the scan is already wide and no exchange runs.
    exploded = widen_if_narrow(docs).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col))).alias("sh"),
    )
    if hash_mode == "portable":
        coeffs = perm_coeffs(num_hashes)
        hashed = exploded.withColumn("shh", charfold_hash(F.col("sh"))).select(
            "id",
            *[
                ((F.lit(a) * F.col("shh") + F.lit(b)) % MINHASH_P).alias(f"h{i}")
                for i, (a, b) in enumerate(coeffs)
            ],
        )

        def band_hash(b: Column) -> Column:
            return F.aggregate(
                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                F.lit(0).cast("long"),
                lambda acc, h: (acc * 131 + h) % MINHASH_P,
            )

    else:
        hashed = exploded.select(
            "id",
            *[F.xxhash64(F.lit(i), "sh").alias(f"h{i}") for i in range(num_hashes)],
        )

        def band_hash(b: Column) -> Column:
            return F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band),
                        lambda h: h.cast("string"),
                    ),
                    ",",
                )
            )

    sig = hashed.groupBy("id").agg(
        F.array(*[F.min(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )
    return sig.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(b.alias("band_id"), band_hash(b).alias("band_hash")),
        ).alias("bands"),
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document: tokens hashed with xxhash64, each
    bitplane summed ±1, sign → bit. All map-side until one agg shuffle
    on the doc id."""
    toks = widen_if_narrow(docs).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return bit_sums.select("id", sim.alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, found via
    4×16-bit band buckets (pigeonhole: ≤3 differing bits ⇒ ≥1 equal
    band), then exact popcount verification on the candidates.

    Pair generation is bucket-array, not self-join (the same rewrite
    as minhash_lsh_candidates): one shuffle on (band_id, band_val)
    collects each bucket's (id, simhash) rows sorted by id, and the
    candidate pairs explode from the array in codegen via nested
    generators (bucket_pairs — O(|bucket|) peak row memory, so a hot
    band value can't OOM a single row) — the signature pipeline
    (token explode × 64 bitplane aggregates) runs ONCE instead of
    once per join side. CPU per bucket is C(|bucket|, 2) either way,
    matching the self-join."""
    sigs = simhash64(docs, text_col, id_col)
    banded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftrightunsigned("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select("id", "simhash", "band.band_id", "band.band_val")
    buckets = (
        banded.groupBy("band_id", "band_val")
        .agg(F.sort_array(F.collect_list(F.struct("id", "simhash"))).alias("xs"))
        .filter(F.size("xs") >= 2)
    )
    cand = (
        bucket_pairs(buckets, "xs")
        .select(
            F.col("_a.id").alias("id_a"),
            F.col("_b.id").alias("id_b"),
            F.col("_a.simhash").alias("sh_a"),
            F.col("_b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "id_a", "id_b", hamming.cast("long").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def simhash_coeffs(n_bits: int = 64) -> list[tuple[int, int]]:
    """Affine coefficients for the portable SimHash bitplanes (a
    different stream than the MinHash perms)."""
    return [
        ((1779033703 * (j + 1)) % MINHASH_P, (2246822519 * (j + 3)) % MINHASH_P)
        for j in range(n_bits)
    ]


def simhash_near_dups_portable(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """simhash_near_dups with a portable bitplane family: each token's
    charfold hash h gives plane j the sign of ((a_j*h+b_j) mod P) -
    P/2. The 64-bit signature is kept as FOUR 16-bit band ints (never
    one 64-bit word — bit 63 would overflow signed int64 differently
    across engines); hamming = sum of per-band popcount(xor). Same
    banding/pigeonhole plan as the engine path, DuckDB-replayable."""
    coeffs = simhash_coeffs(64)
    half = MINHASH_P // 2
    toks = widen_if_narrow(docs).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", charfold_hash(F.col("tok")))
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P > half, 1)
                .otherwise(-1)
            ).alias(f"p{j}")
            for j, (a, b) in enumerate(coeffs)
        ]
    )
    band_cols = [
        sum(
            (
                F.when(F.col(f"p{k * 16 + j}") > 0, F.lit(1 << j))
                .otherwise(F.lit(0))
                .cast("long")
                for j in range(16)
            ),
            F.lit(0).cast("long"),
        ).alias(f"band{k}")
        for k in range(4)
    ]
    sigs = bit_sums.select("id", *band_cols)
    banded = sigs.select(
        "id",
        *[f"band{k}" for k in range(4)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_id"),
                        F.col(f"band{k}").alias("band_val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("band"),
    ).select("id", *[f"band{k}" for k in range(4)], "band.band_id", "band.band_val")
    # bucket-array pair generation, same shape (and rationale) as
    # simhash_near_dups above: the portable signature pipeline (charfold
    # hash × 64 affine bitplanes) runs once, not once per join side
    buckets = (
        banded.groupBy("band_id", "band_val")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("id", *[f"band{k}" for k in range(4)]))
            ).alias("xs")
        )
        .filter(F.size("xs") >= 2)
    )
    cand = (
        bucket_pairs(buckets, "xs")
        .select(
            F.col("_a.id").alias("id_a"),
            F.col("_b.id").alias("id_b"),
            *[F.col(f"_a.band{k}").alias(f"a{k}") for k in range(4)],
            *[F.col(f"_b.band{k}").alias(f"b{k}") for k in range(4)],
        )
        .distinct()
    )
    hamming = sum(
        (
            F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}")))
            for k in range(4)
        ),
        F.lit(0),
    )
    return cand.select(
        "id_a", "id_b", hamming.cast("long").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    docs: DataFrame,
    blocking: Column,
    max_id_gap: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs inside a blocking
    key (e.g. same source, bounded id gap) — the verification stage a
    banding pass feeds at scale. Pure set algebra: tokens exploded
    once, intersection via equi-join on (block, token), union by
    inclusion–exclusion."""
    base = docs.select(
        F.col(id_col).alias("id"),
        blocking.alias("block"),
        F.array_distinct(F.split(normalized_text(F.col(text_col)), " ")).alias("toks"),
    ).withColumn("n_toks", F.size("toks"))
    # n_toks rides the exploded rows (one int per token row) so the
    # union size is already on the joined pair — no per-side join-back
    # of an O(docs) size table after the intersection count
    tok = base.select("id", "block", "n_toks", F.explode("toks").alias("tok"))
    # Band the id space into gap-width buckets and fold the bucket into
    # the equi-join key: a pair with 0 < id_b - id_a <= gap always has
    # bucket(b) ∈ {bucket(a), bucket(a)+1}, so replicating the A side
    # into those two buckets keeps the join an equi-join while cutting
    # the per-token candidate blowup from freq² (all co-occurrences of
    # a token in a block) to only same/adjacent-bucket ones — the
    # difference between O(f²) and O(f·gap/block_span) intermediate
    # rows per common token.
    bucket = F.floor(F.col("id") / F.lit(max_id_gap))
    a = (
        tok.withColumn("g", F.explode(F.array(bucket, bucket + 1)))
        .alias("a")
    )
    b = tok.withColumn("g", bucket).alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.id") - F.col("a.id") <= max_id_gap),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            # functionally dependent on the ids — free extra keys that
            # make the sizes available without a join-back
            F.col("a.n_toks").alias("n_a"),
            F.col("b.n_toks").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    return inter.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
            4,
        ).alias("jaccard"),
    )


def ngram_jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-set Jaccard for an explicit candidate-pair
    DataFrame (``id_a``, ``id_b`` — e.g. the output of
    ``minhash_lsh_candidates``): the verification stage of the
    LSH-then-verify recipe. Only documents that appear in some pair
    are tokenized (semi-join pushdown), so the exact-set work is
    O(candidates), never O(corpus²). Pairs with no shared token keep
    jaccard = 0.0 rather than disappearing; a pair referencing an id
    with no row in ``docs`` (caller passed pairs from a different
    corpus) keeps jaccard = NULL — visible, never silently dropped."""
    wanted = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    base = (
        docs.select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("toks"),
        )
        .join(wanted, "id")
        .withColumn("n_toks", F.size("toks"))
    )
    tok = base.select("id", F.explode("toks").alias("tok"))
    inter = (
        pairs.select("id_a", "id_b")
        .join(tok.alias("ta"), F.col("ta.id") == F.col("id_a"))
        .join(
            tok.alias("tb"),
            (F.col("tb.id") == F.col("id_b")) & (F.col("ta.tok") == F.col("tb.tok")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    na = base.select(F.col("id").alias("id_a"), F.col("n_toks").alias("n_a"))
    nb = base.select(F.col("id").alias("id_b"), F.col("n_toks").alias("n_b"))
    return (
        pairs.select("id_a", "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        # LEFT joins: an id with no doc row must surface as NULL
        # jaccard, not vanish from the output (contract above)
        .join(na, "id_a", "left")
        .join(nb, "id_b", "left")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0))
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0))),
                4,
            ).alias("jaccard"),
        )
    )


def embedding_near_dups(
    embeddings: DataFrame,
    bucket: Column,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking bucket.
    Cosine is pure-Column math; the filter compares the ROUNDED value
    so the threshold boundary is engine-stable."""
    base = widen_if_narrow(
        embeddings.select(
            F.col(id_col).alias("id"),
            bucket.alias("bucket"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    a, b = base.alias("a"), base.alias("b")
    cos = F.round(cosine(F.col("a.v"), F.col("b.v")), 4)
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def dup_span_removal(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicate-substring removal (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): any word ``k``-gram
    occurring >= ``min_count`` times across the whole corpus marks its
    k-token span for removal in every document containing it; output
    is one row per document with the removal audit and an md5 of the
    surviving token sequence (compact: the driver never ships rebuilt
    text, only the digest).

    Scale shape: gram identity is a 128-bit md5 digest of the k-token
    window, so the global frequency pass shuffles (digest, doc_id,
    pos) — never document text. One wide exchange on the digest
    (window count = single shuffle, map-side partials apply), then
    covered-position expansion (ints only), an anti-join on
    (doc_id, pos), and a per-doc rebuild where each surviving token
    crosses the wire exactly once. All JVM/codegen — no Python. At
    100 TB swap md5 for ``xxhash64`` (8-byte shuffle keys; the repo's
    oracle_bits machinery proves the replay) and block the global
    count by digest range.

    Reference analog: the reference dedups occurrences row-wise by
    (bvid, song) key (src/firefly_vcut/db/occurrence.py:16-24); this
    is the corpus-level generalization its training-data pipeline
    would need.
    """
    from pyspark.sql import Window

    t = F.split(normalized_text(F.col(text_col)), " ")
    toks = docs.select(F.col(id_col).alias("doc_id"), t.alias("t"))
    # sequence(1, n) is DESCENDING when n < 1, so gram generation is
    # gated on size(t) >= k rather than clamped with greatest().
    grams = (
        toks.filter(F.size("t") >= k)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {k - 1}), "
                    f"i -> struct(i AS pos, md5(array_join(slice(t, i, {k}), ' ')) AS g))"
                )
            ).alias("x"),
        )
        .select("doc_id", F.col("x.pos").alias("pos"), F.col("x.g").alias("g"))
    )
    dup_starts = (
        grams.withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .filter(F.col("cnt") >= min_count)
        .select("doc_id", "pos")
    )
    covered = dup_starts.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("pos"),
    ).distinct()
    tokpos = toks.select(
        "doc_id", F.posexplode("t").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = (
        tokpos.join(covered, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("kept_md5"),
        )
    )
    totals = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("kept_md5"), F.md5(F.lit(""))).alias("kept_md5"),
    )
