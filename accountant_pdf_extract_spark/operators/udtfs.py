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

import re

from pyspark.sql.functions import udtf

# Java/Spark regex \s is ASCII-only ([ \t\n\x0B\f\r]) while Python's
# \s is Unicode (matches NBSP U+00A0 etc.) — the UDTF must use the
# ASCII class or SQL users get different shingles than shingle_df for
# the same rows (NBSP is representable in the latin-1 PDF plane).
_ASCII_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


@udtf(returnType="shingle: string, pos: int")
class ShingleUDTF:
    """All k-char shingles of whitespace-normalized, lowercased text."""

    def eval(self, text: str, k: int):  # noqa: D102
        if text and k and k > 0:
            # EXACT mirror of _shingles_sql's normalization:
            # lower → trim SPACES only (SQL trim) → collapse Java-\s
            # runs.  ' '.join(split()) would also strip edge
            # tabs/newlines and fork the two advertised-equivalent
            # surfaces.
            n = _ASCII_WS_RE.sub(" ", text.lower().strip(" "))
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
