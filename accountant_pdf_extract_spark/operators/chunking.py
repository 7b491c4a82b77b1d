"""Document chunking for training pipelines: split each document's
token stream into fixed-size windows (optionally overlapping) — the
step between cleaning and shard packing (``operators/packing.py``).

Pure Catalyst: tokenize once per row, then ``sequence`` + ``explode``
+ ``slice`` build the windows map-side — no shuffle, no Python, scales
linearly with executors.  Chunk starts advance by
``chunk_tokens - overlap``; a window is emitted only when it carries
at least one NEW token (``start + overlap < n``), so trailing tokens
are never dropped AND no fully-redundant tail chunk (one whose every
token the previous window already covered) duplicates training data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_chunk_tokens) — one row per token
    window.  Empty/blank documents yield no rows."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    base = df.select(
        F.col(id_col), toks.alias("_tk"), F.size(toks).alias("_n")
    ).where(F.col("_n") > 0)
    piece = F.slice(
        F.col("_tk"), (F.col("chunk_id") * step + 1).cast("int"), chunk_tokens
    )
    return (
        base.select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    # last start must bring >= 1 new token: with
                    # overlap o, starts beyond n-o-1 are fully covered
                    # by the previous window (n <= o docs get 1 chunk)
                    F.floor(
                        (F.greatest(F.col("_n") - overlap, F.lit(1)) - 1)
                        / step
                    ),
                )
            ).alias("chunk_id"),
            "_tk",
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("long").alias("n_chunk_tokens"),
        )
    )
