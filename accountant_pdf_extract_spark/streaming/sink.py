"""Shared foreachBatch sink: batch-id-keyed dynamic partition
overwrite.  Replay idempotency for every streaming runner in this
package — a micro-batch re-run after a crash between the write and
the checkpoint commit REPLACES its own ``_batch_id`` partition(s)
instead of appending duplicates (plain append would be
at-least-once).  Single-sourced here so the idempotency mechanism
can't drift between runners.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def batch_keyed_parquet_sink(output_dir: str, *extra_partition_cols: str):
    """Return a ``foreachBatch``-compatible ``sink(df, batch_id)``
    writing ``df`` to ``output_dir`` partitioned by ``_batch_id``
    (plus any ``extra_partition_cols``, e.g. the salt bucket) with
    dynamic partition overwrite scoped to THIS writer only (per-write
    option, never a session-wide conf mutation)."""

    def sink(df, batch_id):
        (
            df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id", *extra_partition_cols)
            .parquet(output_dir)
        )

    return sink
