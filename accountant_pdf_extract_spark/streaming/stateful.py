"""Custom stateful streaming operator via ``applyInPandasWithState``
(the arbitrary-state API): per-user running event counters that
survive across micro-batches through the checkpointed state store.

This is the streaming twin of ``operators/sessions.py`` — batch
sessionization is two window functions; streaming accumulation is
explicit state.  State schema and output schema are pinned
StructTypes; the pandas callback sees an iterator of per-key frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from accountant_pdf_extract_spark.functions.money import half_up_cents_np


def running_user_counts(
    events_stream,
    checkpoint_dir: str,
    output_dir: str,
    available_now: bool = True,
):
    """Streaming per-user totals: count + value cents, accumulated in
    the state store across micro-batches and emitted (update mode →
    parquet append via foreachBatch is overkill here; we emit to the
    sink each batch).

    Contract: ``user_id`` must be integral (output/state schemas are
    pinned ``long``) — enforced up front like ``stream_dedup_exact``;
    a string id would only fail at Arrow serialization deep inside an
    executor mid-stream."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = events_stream.schema["user_id"].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            "running_user_counts needs an integral 'user_id' (state "
            f"schema is 'long'); got {id_type.simpleString()}"
        )

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].to_numpy()
            # finite-only: one ±inf would make int(inf) raise inside
            # the state callback and permanently wedge the stream
            # (every checkpoint replay hits the same row)
            cents += int(half_up_cents_np(v[np.isfinite(v)]).sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_cents": [cents]}
        )

    stateful = events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_cents long",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    from accountant_pdf_extract_spark.streaming.sink import (
        batch_keyed_parquet_sink,
    )

    sink = batch_keyed_parquet_sink(output_dir)
    writer = (
        stateful.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
