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
    option, never a session-wide conf mutation).

    Checkpoint/output lifetimes are COUPLED: batch ids come from the
    checkpoint, so pointing a FRESH checkpoint (ids restart at 0) at
    an already-populated output would silently clobber delivered
    partitions.  The sink refuses that rewind: a write whose batch_id
    is behind the directory's max existing ``_batch_id`` raises
    (legit crash-replay rewrites its OWN id, never a smaller one)."""

    def sink(df, batch_id):
        existing = _max_batch_id(output_dir)
        if existing is not None and batch_id < existing:
            raise ValueError(
                f"batch_id {batch_id} is behind the sink's newest "
                f"partition (_batch_id={existing}) at {output_dir!r} — "
                "a fresh checkpoint is replaying over an older run's "
                "output; use a new output dir or restore the original "
                "checkpoint"
            )
        (
            df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id", *extra_partition_cols)
            .parquet(output_dir)
        )

    return sink


def _max_batch_id(output_dir: str) -> int | None:
    """Largest existing ``_batch_id=`` partition value, driver-side
    listdir only (no Spark job)."""
    import os

    try:
        names = os.listdir(output_dir)
    except FileNotFoundError:
        return None
    ids = []
    for n in names:
        if n.startswith("_batch_id="):
            try:
                ids.append(int(float(n.split("=", 1)[1])))
            except ValueError:
                continue
    return max(ids) if ids else None
