"""Python UDTFs (Spark 4 table-valued functions) — the lateral-join
surface for row→rows expansion, registrable for SQL users:

    spark.udtf.register("shingles", ShingleUDTF)
    SELECT d.doc_id, s.shingle
    FROM documents d, LATERAL shingles(d.text, 8) s

The engine's hot paths use ``mapInArrow`` (batch-level, faster); the
UDTF form exists for SQL-first composition — same shingle semantics as
``operators/dedup.shingle_df`` (normalized text, k-char windows).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="shingle: string, pos: int")
class ShingleUDTF:
    """All k-char shingles of whitespace-normalized, lowercased text."""

    def eval(self, text: str, k: int):  # noqa: D102
        import re

        if text and k and k > 0:
            # EXACT mirror of _shingles_sql's normalization:
            # lower → trim SPACES only (SQL trim) → collapse \s+ runs.
            # ' '.join(split()) would also strip edge tabs/newlines and
            # fork the two advertised-equivalent surfaces.
            n = re.sub(r"\s+", " ", text.lower().strip(" "))
            for i in range(max(len(n) - k + 1, 0)):
                yield n[i : i + k], i


@udtf(returnType="token: string, pos: int, is_stopword: boolean")
class TokenizeUDTF:
    """Whitespace tokens with position + a tiny English stopword flag."""

    _STOP = frozenset("the and of to a in is".split())

    def eval(self, text: str):  # noqa: D102
        if text:
            for i, tok in enumerate(text.lower().split()):
                yield tok, i, tok in self._STOP


def register_udtfs(spark) -> None:
    spark.udtf.register("shingles", ShingleUDTF)
    spark.udtf.register("tokenize", TokenizeUDTF)
