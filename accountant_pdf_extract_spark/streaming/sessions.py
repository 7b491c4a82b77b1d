"""Streaming sessionization via ``session_window`` — the streaming
twin of ``operators/sessions.sessionize`` (batch = two window
functions; streaming = Spark's built-in gap-based session windows
with watermark-driven state eviction).

A session closes when no event arrives for ``gap``; the watermark
bounds how late an event may extend a session, so state for sessions
older than (watermark + gap) is evicted — bounded state on an
unbounded stream, the property a hand-rolled stateful op would have
to re-implement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from accountant_pdf_extract_spark.plans.driver_queries import cents


def streaming_sessionize(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 seconds",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-(user, session) aggregates over gap-based session windows:
    (user_id, session_start, session_end, n_events, value_cents).
    Append-mode compatible (rows emit once the watermark passes the
    session's end)."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            # cents() is THE single-sourced money conversion; non-finite
            # values become NULL first (sum skips them) — round(inf/NaN)
            # .cast(long) would throw under ansi=true and kill the query
            F.sum(cents(
                F.when(
                    F.isnan(F.col(value_col))
                    | (F.abs(F.col(value_col)) == float("inf")),
                    F.lit(None),
                ).otherwise(F.col(value_col))
            )).alias("value_cents"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_cents",
        )
    )


def run_streaming_sessionize(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    gap: str = "30 minutes",
    watermark: str = "10 seconds",
):
    """AvailableNow drain to a batch-id-keyed dynamic-overwrite sink
    (replays replace their own partition — idempotent)."""
    from accountant_pdf_extract_spark.streaming.sink import (
        batch_keyed_parquet_sink,
    )

    stream = spark.readStream.schema(
        "ts timestamp, user_id long, value double"
    ).parquet(input_dir)
    sess = streaming_sessionize(stream, gap=gap, watermark=watermark)
    sink = batch_keyed_parquet_sink(output_dir)
    q = (
        sess.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
