"""Behavioral reimplementation of the reference's sliding-window
fuzzy scan (fuzz.py:3-43 semantics, written from SURVEY.md's
description — the test golden for the engine's W1 operator).

Quirks preserved: k = line-count of needle; pages shorter than k are
scored whole, once; running max with strict ``>`` (first maximum
wins, scan order = page asc then window-start asc); returns the start
of the window's first segment and the 1-based page. Deviation from
the reference: an empty/all-empty transcript returns None instead of
crashing (SURVEY §7.3).
"""

from __future__ import annotations

from collections.abc import Callable


def dp_levenshtein(a: str, b: str) -> int:
    """Straight-DP edit distance (substitution cost 1)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def dp_lcs(a: str, b: str) -> int:
    """Straight-DP longest common subsequence length."""
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def lev_sum_ratio(a: str, b: str) -> float:
    return 100.0 * (1.0 - dp_levenshtein(a, b) / max(len(a) + len(b), 1))


def dp_indel_ratio(a: str, b: str) -> float:
    if len(a) + len(b) == 0:
        return 100.0
    return 200.0 * dp_lcs(a, b) / (len(a) + len(b))


Scorer = Callable[[str, str], float]


def best_match(
    needle: str,
    pages: list[list[dict]],
    scorer: Scorer,
) -> tuple[float, float, int, int] | None:
    """Best-scoring window for one (needle, transcript) pair.

    Returns (score, start_of_first_segment, 1-based page, seg_idx)
    or None when no window exists."""
    k = len(needle.split("\n"))
    best: tuple[float, float, int, int] | None = None
    for page_idx, page in enumerate(pages):
        if not page:
            continue
        if len(page) < k:
            text = "\n".join(seg["text"] for seg in page)
            cands = [(0, page[0]["start"], text)]
        else:
            cands = [
                (
                    i,
                    page[i]["start"],
                    "\n".join(seg["text"] for seg in page[i : i + k]),
                )
                for i in range(len(page) - k + 1)
            ]
        for i, start, text in cands:
            s = scorer(needle, text)
            if best is None or s > best[0]:
                best = (s, start, page_idx + 1, i)
    return best
