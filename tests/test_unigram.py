"""Unigram-LM tokenizer semantics: Viterbi optimality vs a
brute-force enumeration reference, tie-break order, segmentation
totality, and the hard-EM rescore — the properties the 12-stage
unrolled-CTE oracle then re-verifies corpus-wide."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from firefly_vcut_spark.operators.unigram import (
    MAX_PIECE_LEN,
    em_rescore,
    fit_pieces,
    piece_scores,
    viterbi_words,
)


def _words(spark, rows):
    return spark.createDataFrame(rows, "word string, freq long")


def _brute_force(word: str, costs: dict[str, int]):
    """min (cost, n, seg) over ALL segmentations into vocabulary
    pieces of length <= MAX_PIECE_LEN — exponential reference."""
    best = None
    n = len(word)
    for cuts in itertools.product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        pieces = [word[a:b] for a, b in zip(bounds, bounds[1:])]
        if any(len(p) > MAX_PIECE_LEN or p not in costs for p in pieces):
            continue
        cand = (sum(costs[p] for p in pieces), len(pieces), " ".join(pieces))
        if best is None or cand < best:
            best = cand
    return best


def test_viterbi_beats_greedy_longest_match(spark):
    # 'abc' with cheap {a, bc} and expensive {ab, c}: greedy
    # longest-match takes ab+c (cost 20); Viterbi must find a+bc
    pieces = [("a", 1), ("b", 50), ("c", 10), ("ab", 10), ("bc", 1)]
    out = viterbi_words(_words(spark, [("abc", 1)]), pieces).collect()[0]
    assert out["seg"] == "a bc"
    assert out["cost_micro"] == 2
    assert out["n_pieces"] == 2


def test_tiebreak_fewest_pieces_then_lexicographic_seg(spark):
    # every single char and both bigrams cost 5: 'ab' as one piece
    # ('ab', n=1, cost 5) must beat 'a b' (n=2, cost 10); with equal
    # cost AND n, the lexicographically smaller seg wins
    pieces = [("a", 5), ("b", 5), ("ab", 5)]
    out = viterbi_words(_words(spark, [("ab", 1)]), pieces).collect()[0]
    assert (out["cost_micro"], out["n_pieces"], out["seg"]) == (5, 1, "ab")
    # 'aa' with {a:3, aa:6}: equal cost 6 — n breaks the tie to 'aa'
    out2 = viterbi_words(_words(spark, [("aa", 1)]), [("a", 3), ("aa", 6)]).collect()[0]
    assert (out2["cost_micro"], out2["n_pieces"], out2["seg"]) == (6, 1, "aa")


def test_viterbi_matches_bruteforce_on_random_vocab(spark):
    rng = random.Random(77)
    alpha = "abc"
    vocab: dict[str, int] = {c: rng.randint(1, 9) for c in alpha}
    for _ in range(12):  # random multi-char pieces, random costs
        ln = rng.randint(2, MAX_PIECE_LEN)
        p = "".join(rng.choice(alpha) for _ in range(ln))
        vocab.setdefault(p, rng.randint(1, 30))
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 9))) for _ in range(40)]
    words = sorted(set(words))
    out = {
        r["word"]: (r["cost_micro"], r["n_pieces"], r["seg"])
        for r in viterbi_words(
            _words(spark, [(w, 1) for w in words]), sorted(vocab.items())
        ).collect()
    }
    for w in words:
        assert out[w] == _brute_force(w, vocab), w


def test_fitted_model_segments_every_corpus_word(spark):
    # totality: single chars are always in the fitted vocabulary, so
    # the decode of the SAME corpus never yields a null state
    w = _words(spark, [("spark", 3), ("shuffle", 2), ("scan", 5), ("a", 1)])
    enc = viterbi_words(w, fit_pieces(w)).collect()
    assert len(enc) == 4
    for r in enc:
        assert r["seg"] is not None
        assert r["seg"].replace(" ", "") == r["word"]


def test_piece_scores_keeps_all_singles_and_topk_multis(spark):
    w = _words(spark, [("abab", 10), ("cd", 1)])
    rows = piece_scores(w, k_multi=2).collect()
    got = {r["piece"]: r["weight"] for r in rows}
    # all 4 chars present; exactly 2 multis survive by
    # (weight DESC, piece ASC): ab(20), then aba(10) beating the
    # equal-weight ba(10) lexicographically
    assert {"a", "b", "c", "d"} <= set(got)
    multis = {p for p in got if len(p) >= 2}
    assert multis == {"ab", "aba"}
    assert got["ab"] == 20 and got["a"] == 20


def test_em_rescore_drops_unused_pieces(spark):
    # 'ab' always segments as the single piece 'ab' (cost 1 beats
    # a+b = 20), so the rescore keeps only 'ab'
    w = _words(spark, [("ab", 7)])
    enc = viterbi_words(w, [("a", 10), ("b", 10), ("ab", 1)])
    rows = em_rescore(enc).collect()
    assert [(r["piece"], r["used_weight"]) for r in rows] == [("ab", 7)]
    assert rows[0]["new_cost_micro"] == 0  # ln(7/7) = 0


def test_em_reencode_stays_within_surviving_vocab(spark):
    # round-2 decode must (a) still concatenate back to each word and
    # (b) use only pieces that survived the hard-EM rescore (= pieces
    # the round-1 decode used)
    from firefly_vcut_spark.operators.unigram import fit_em_pieces

    w = _words(spark, [("spark", 3), ("shuffle", 2), ("scan", 5), ("sparks", 1)])
    p2 = fit_em_pieces(w)
    survivors = {p for p, _ in p2}
    enc2 = viterbi_words(w, p2).collect()
    assert len(enc2) == 4
    for r in enc2:
        assert r["seg"].replace(" ", "") == r["word"]
        assert set(r["seg"].split(" ")) <= survivors


def test_em_round_can_change_the_segmentation(spark):
    # seed weights make 'ab' and single chars comparably cheap, but the
    # round-1 decode concentrates usage so the rescored model re-prices
    # pieces; verify the loop is live (costs change), and decode-2 is
    # optimal under the NEW model per brute force
    from firefly_vcut_spark.operators.unigram import fit_em_pieces

    w = _words(spark, [("abab", 5), ("ab", 3), ("ba", 2)])
    p1 = dict(fit_pieces(w))
    p2 = dict(fit_em_pieces(w))
    assert set(p2) <= set(p1)
    assert any(p2[p] != p1[p] for p in p2)  # re-estimation moved costs
    out = {
        r["word"]: (r["cost_micro"], r["n_pieces"], r["seg"])
        for r in viterbi_words(w, sorted(p2.items())).collect()
    }
    for word in ("abab", "ab", "ba"):
        assert out[word] == _brute_force(word, p2), word


def test_viterbi_is_character_based_not_byte_based(spark):
    # multi-byte UTF-8: substr/length are CHARACTER semantics in both
    # engines; a byte-based regression would slice through codepoints
    pieces = [("α", 7), ("β", 7), ("γ", 7), ("αβ", 5), ("βγ", 4)]
    out = {
        r["word"]: (r["cost_micro"], r["n_pieces"], r["seg"])
        for r in viterbi_words(
            _words(spark, [("αβγ", 1), ("γβα", 1)]), pieces
        ).collect()
    }
    assert out["αβγ"] == (11, 2, "α βγ")  # α+βγ (11) beats αβ+γ (12)
    assert out["γβα"] == (21, 3, "γ β α")  # only singles cover it


def test_max_word_len_boundary_inclusive(spark):
    # a word of EXACTLY MAX_WORD_LEN chars must encode; one char longer
    # must be absent — mirroring the oracle, whose unrolled DP chain
    # tops out at stage MAX_WORD_LEN
    from firefly_vcut_spark.operators.unigram import MAX_WORD_LEN

    at = "a" * MAX_WORD_LEN
    over = "a" * (MAX_WORD_LEN + 1)
    out = viterbi_words(
        _words(spark, [(at, 1), (over, 1)]), [("a", 2), ("aa", 3)]
    ).collect()
    assert [r["word"] for r in out] == [at]
    assert out[0]["seg"].replace(" ", "") == at
