"""Watermarked stream-stream inner join — the last §2.10 streaming
shape: two unbounded inputs joined on a key within a bounded event-time
band, state pruned by watermarks.

Classic use in a training-data pipeline: join a document stream to a
late-arriving annotation/label stream without buffering either side
forever.  Both sides carry watermarks and the join condition bounds
the event-time skew, so Spark can evict state older than
``watermark + band`` — without the time bound a stream-stream join
must keep EVERY past row and the state store grows unboundedly (the
100-TB streaming wall).

Scale shape: state is hash-partitioned by the join key across the
shuffle partitions; each micro-batch does local lookups only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "rts",
    watermark: str = "10 seconds",
    band_seconds: int = 60,
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event lands
    within ``[left_ts, left_ts + band_seconds]`` — both sides
    watermarked so join state is evictable.  Returns the joined
    streaming DataFrame (caller attaches the sink)."""
    lw = left_stream.withWatermark(left_ts, watermark)
    rw = right_stream.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {band_seconds} SECONDS"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def run_stream_stream_join(
    spark,
    left_dir: str,
    right_dir: str,
    left_schema: str,
    right_schema: str,
    key: str,
    checkpoint_dir: str,
    output_dir: str,
    left_ts: str = "ts",
    right_ts: str = "rts",
    watermark: str = "10 seconds",
    band_seconds: int = 60,
):
    """File-source AvailableNow drain of the watermarked join —
    batch-id-keyed dynamic overwrite sink, so replays after a crash
    replace their own partition instead of appending duplicates
    (exactly-once to the parquet sink)."""
    left = spark.readStream.schema(left_schema).parquet(left_dir)
    right = spark.readStream.schema(right_schema).parquet(right_dir)
    joined = stream_stream_join(
        left, right, key, left_ts, right_ts,
        watermark=watermark, band_seconds=band_seconds,
    )

    from accountant_pdf_extract_spark.streaming.sink import (
        batch_keyed_parquet_sink,
    )

    sink = batch_keyed_parquet_sink(output_dir)
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
