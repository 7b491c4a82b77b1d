"""Structured Streaming ingestion (SURVEY.md §2.10 stretch): the core
pipeline is a pure DataFrame→DataFrame function, so streaming is a
thin ``foreachBatch`` wrapper — each micro-batch runs the identical
extraction and lands in the same bucket-partitioned sink, giving
exactly-once-per-batch semantics on top of the checkpoint dir.

``Trigger.AvailableNow`` drains a parquet directory incrementally —
the idiomatic batch-incremental ingestion for a corpus that grows by
file drops (the 100 TB analogue: new Iceberg snapshots land, the
stream picks up only new files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from accountant_pdf_extract_spark.plans.pipeline import SALT_COL, extract
from accountant_pdf_extract_spark.schema import INPUT_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    salt_buckets: int = 256,
    num_partitions: int | None = None,
    available_now: bool = True,
):
    """Start (and by default fully drain) the streaming extraction.
    Returns the StreamingQuery, with the stream-wide dropped-doc
    accumulator attached as ``q.dropped_docs_acc`` (ONE accumulator
    shared across all micro-batches — per-batch registration would
    grow the driver's accumulator registry without bound on a
    continuous stream, and its value would be thrown away)."""
    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    from accountant_pdf_extract_spark.streaming.sink import (
        batch_keyed_parquet_sink,
    )

    sink = batch_keyed_parquet_sink(output_dir, SALT_COL)
    drop_acc = spark.sparkContext.accumulator(0)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        flat = extract(
            batch_df,
            salt_buckets=salt_buckets,
            num_partitions=num_partitions,
            keep_salt=True,
            drop_acc=drop_acc,
        )
        sink(flat, batch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.dropped_docs_acc = drop_acc
    if available_now:
        q.awaitTermination()
        if drop_acc.value:
            print(
                f"stream_extract: {drop_acc.value} doc(s) dropped by the "
                "extraction kernel this drain (at-least-once count; see "
                "commit-log deltas for the exact ledger)",
                flush=True,
            )
    return q
