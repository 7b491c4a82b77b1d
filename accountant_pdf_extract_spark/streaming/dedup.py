"""Streaming exact dedup: first-seen-wins across micro-batches.

The batch twin is ``operators/dedup.exact_dup_groups`` (one hash agg);
the streaming form needs cross-batch memory — implemented with
``applyInPandasWithState`` keyed on the normalized content hash, so a
document whose hash was emitted in ANY earlier micro-batch is dropped.
State per key is a single boolean-shaped marker (the kept doc_id), so
the state store grows O(distinct hashes) — the same footprint a
dropDuplicates-with-state would hold, but with the kept-id retrievable.

At scale: state is hash-partitioned by the content hash (Spark's
streaming state store is per shuffle-partition), so the dedup check is
a local lookup — no global coordination.  For bounded state on
unbounded streams, swap NoTimeout for a processing-time timeout tuned
to the re-crawl horizon.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from accountant_pdf_extract_spark.operators.dedup import norm_text


def stream_dedup_exact(
    docs_stream,
    checkpoint_dir: str,
    output_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """Drain ``docs_stream`` (needs ``id_col`` + ``text_col``), keeping
    only the first document observed per content hash across ALL
    micro-batches; appends (doc_id, content_hash) of the kept docs to
    ``output_dir``.  Returns the StreamingQuery.

    'First' means smallest id WITHIN a micro-batch, first-SEEN across
    batches: streaming state cannot retract an already-emitted winner,
    so when duplicates of one hash span trigger boundaries the kept id
    depends on arrival order — the batch twin's global ``min(id)`` is
    only guaranteed when all copies share a batch.

    Contract: ``id_col`` must be an integral column (the state/output
    schemas are pinned ``long``) — enforced up front, because a string
    id would only fail deep inside an executor.  NULL ids are dropped
    (a null would promote the pandas column to float and crash
    ``int(min)``); NULL text is dropped exactly like the batch twin
    ``exact_dup_groups`` — md5(NULL) would collapse every
    failed-extraction doc into one phantom duplicate group and
    suppress all but the first forever."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = docs_stream.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"stream_dedup_exact needs an integral {id_col!r} "
            f"(state schema is 'long'); got {id_type.simpleString()}"
        )
    hashed = docs_stream.where(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm_text(F.col(text_col))).alias("content_hash"),
    )

    def keep_first(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (content_hash,) = key
        if state.exists:
            # hash already emitted in an earlier batch: drop everything
            for _ in pdfs:
                pass
            return
        best = None
        for pdf in pdfs:
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        if best is None:
            return
        state.update((best,))
        yield pd.DataFrame(
            {"doc_id": [best], "content_hash": [content_hash]}
        )

    deduped = hashed.groupBy("content_hash").applyInPandasWithState(
        keep_first,
        outputStructType="doc_id long, content_hash string",
        stateStructType="keep_id long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    from accountant_pdf_extract_spark.streaming.sink import (
        batch_keyed_parquet_sink,
    )

    sink = batch_keyed_parquet_sink(output_dir)
    writer = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
