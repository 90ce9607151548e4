"""Anchors for the generated-SQL oracle primitives (oracle_bits):

- Python XXH64 reference == Spark ``F.xxhash64`` (incl. the int-literal
  seed chain Spark applies for multi-arg calls);
- DuckDB-emitted XXH64 SQL == Python reference across every length
  regime (empty / <4 / <8 / <32 / stripes / multi-stripe, multi-byte
  UTF-8);
- DuckDB-emitted LCS SQL == the engine's bit-parallel lcs_length ==
  a straight-DP reference.

These make the exact-indel flagship oracle and the xxhash64 dedup
oracles self-verifying: if either engine's hash/LCS semantics drift,
these fail before the driver's sweep does.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from firefly_vcut_spark import oracle_bits as ob
from firefly_vcut_spark.functions.similarity import lcs_length
from tests.fuzz_port import dp_lcs

WORDS = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "ña", "中文", "x"]

SAMPLES = [
    "", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh",
    "0123456789012345678901234567890",      # 31 (max non-stripe)
    "01234567890123456789012345678901",     # 32 (one stripe)
    "x" * 63, "x" * 64, "x" * 65, "x" * 96, "x" * 97,
    "-123456789,987654321,-5,42",           # band-hash shaped input
    "ña 中文 mixed",                         # multi-byte UTF-8
]


def _rand_samples(n: int = 30) -> list[str]:
    rng = random.Random(11)
    return [
        " ".join(rng.choices(WORDS, k=rng.randint(1, 25))) for _ in range(n)
    ]


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def test_python_xxh64_matches_spark(spark):
    samples = SAMPLES + _rand_samples()
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h"),
        F.xxhash64(F.lit(7), "s").alias("h7"),
    ).collect()
    for r in rows:
        assert r["h"] == ob.spark_xxhash64_str(r["s"]), r["s"]
        assert r["h7"] == ob.to_signed64(
            ob.xxh64_bytes(r["s"].encode(), ob.seed_after_int_lit(7))
        ), r["s"]


@pytest.mark.parametrize("seed", [42, ob.seed_after_int_lit(0), ob.seed_after_int_lit(31)])
def test_sql_xxh64_matches_python(seed):
    samples = SAMPLES + _rand_samples()
    rows = ", ".join(f"({_q(s)})" for s in samples)
    base = (
        f"(SELECT s, {ob.bytes_list('s')} AS bs, "
        f"octet_length(encode(s)) AS bn FROM (VALUES {rows}) t(s))"
    )
    steps = ob.xxh64_sql_steps("bs", "bn", str(seed), "hh")
    sql = (
        f"SELECT s, {ob.signed64('hh')} AS h "
        f"FROM {ob.chain_sql(base, ['s', 'bs', 'bn'], steps)}"
    )
    con = duckdb.connect()
    got = dict(con.sql(sql).fetchall())
    for s in samples:
        assert got[s] == ob.to_signed64(ob.xxh64_bytes(s.encode(), seed)), s


def test_sql_lcs_matches_engine_and_dp():
    rng = random.Random(3)
    pairs = [("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
             ("a" * 126, "a" * 200), ("ab" * 60, "ba" * 90)]
    for _ in range(60):
        a = " ".join(rng.choices(WORDS[:6], k=rng.randint(0, 18)))[:120]
        b = " ".join(rng.choices(WORDS[:6], k=rng.randint(0, 30)))
        pairs.append((a, b))
    rows = ", ".join(f"({_q(a)}, {_q(b)})" for a, b in pairs)
    sql = f"SELECT a, b, {ob.lcs_expr('a', 'b')} AS l FROM (VALUES {rows}) t(a, b)"
    con = duckdb.connect()
    got = {(a, b): l for a, b, l in con.sql(sql).fetchall()}
    for a, b in pairs:
        assert got[(a, b)] == lcs_length(a, b) == dp_lcs(a, b), (a[:30], b[:30])


def test_sql_lcs_needle_guard():
    """Needles beyond the 126-bit word yield NULL (loud oracle
    mismatch), never a wrong number."""
    sql = f"SELECT {ob.lcs_expr('a', 'b')} AS l FROM (SELECT repeat('q', 127) AS a, 'q' AS b)"
    con = duckdb.connect()
    assert con.sql(sql).fetchall() == [(None,)]


# --- r4: exhaustive length-residue sweep + hypothesis fuzz ---


def _sql_xxh64_batch(samples: list[str], seed: int) -> dict[str, int]:
    """One DuckDB query hashing every sample with the emitted SQL.
    Samples go in as BOUND PARAMETERS, not literals, so hypothesis is
    free to throw control characters / NULs / quotes at the emitter."""
    rows = ", ".join(f"({i}, ?)" for i in range(len(samples)))
    base = (
        f"(SELECT i, s, {ob.bytes_list('s')} AS bs, "
        f"octet_length(encode(s)) AS bn FROM (VALUES {rows}) t(i, s))"
    )
    steps = ob.xxh64_sql_steps("bs", "bn", str(seed), "hh")
    sql = (
        f"SELECT i, {ob.signed64('hh')} AS h "
        f"FROM {ob.chain_sql(base, ['i', 's', 'bs', 'bn'], steps)}"
    )
    con = duckdb.connect()
    got = dict(con.execute(sql, list(samples)).fetchall())
    return {samples[i]: h for i, h in got.items()}


@pytest.mark.parametrize("seed", [42, ob.seed_after_int_lit(5)])
def test_sql_xxh64_every_length_residue(seed):
    """EVERY byte length 0..96 (two random payloads each): covers all
    tail residues of the <4 / <8 / <32 / 1-stripe / multi-stripe
    regimes, so no length-dependent branch of the emitted SQL goes
    unexercised."""
    import string

    alphabet = string.ascii_letters + string.digits + "!#%&()*+,-./:;<=>?@"
    rng = random.Random(7)
    samples: list[str] = []
    for n in range(0, 97):
        for _ in range(2):
            samples.append("".join(rng.choice(alphabet) for _ in range(n)))
    samples = list(dict.fromkeys(samples))
    got = _sql_xxh64_batch(samples, seed)
    for s in samples:
        expect = ob.to_signed64(ob.xxh64_bytes(s.encode(), seed))
        assert got[s] == expect, f"len={len(s.encode())}"


def test_sql_xxh64_hypothesis_unicode():
    """Hypothesis fuzz: arbitrary unicode text (multi-byte UTF-8 moves
    the byte-length residues independently of the char length) must
    hash identically in the emitted SQL and the Python reference that
    is itself anchored to F.xxhash64."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(st.text(max_size=80))
    def check(s: str) -> None:
        got = _sql_xxh64_batch([s], 42)[s]
        assert got == ob.to_signed64(ob.xxh64_bytes(s.encode(), 42))

    check()


def test_sql_lcs_hypothesis():
    """Hypothesis fuzz of the bit-parallel LCS SQL against the straight
    DP reference (small alphabet → collision-rich subsequences; needle
    capped at the 126-char word limit)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alpha = st.text(alphabet="ab ", max_size=126)
    alpha_b = st.text(alphabet="ab ", max_size=200)

    @settings(max_examples=100, deadline=None)
    @given(alpha, alpha_b)
    def check(a: str, b: str) -> None:
        sql = f"SELECT {ob.lcs_expr('a', 'b')} AS l FROM (SELECT ? AS a, ? AS b) t"
        con = duckdb.connect()
        (got,) = con.execute(sql, [a, b]).fetchall()[0]
        assert got == dp_lcs(a, b) == lcs_length(a, b)

    check()
