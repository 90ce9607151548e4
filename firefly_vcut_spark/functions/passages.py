"""Python UDTF variant of the passage chunker — the Spark 4
user-defined TABLE function API surface (one input row → many output
rows, usable in SQL via LATERAL), registered for API parity.

The production chunking path is plans/winnow_sql.corpus_passage_chunks
(pure-Column, codegen, no Python); this UDTF exists for the cases a
table function genuinely needs imperative Python — and the pytest
asserts both paths agree, so swapping between them is safe.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: bigint, n_tokens: bigint, chunk_text: string")
class SplitPassages:
    """LATERAL-joinable passage splitter: yields overlapping
    (64-token window, stride 48) chunks of the normalized text —
    the same rule as corpus_passage_chunks."""

    W, S = 64, 48

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = [t for t in re.sub(r"\s+", " ", text.lower().strip()).split(" ") if t]
        n = len(toks)
        if n == 0:
            return
        n_chunks = 1 + (max(n - self.W, 0) + self.S - 1) // self.S
        for ci in range(n_chunks):
            ck = toks[ci * self.S : ci * self.S + self.W]
            yield ci, len(ck), " ".join(ck)


def register(spark) -> None:
    """Make the UDTF callable from SQL: SELECT p.* FROM documents,
    LATERAL split_passages(text) p."""
    spark.udtf.register("split_passages", SplitPassages)
