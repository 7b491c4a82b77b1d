"""The scaled batch job (SURVEY.md §3.3): spark-submit entry with
exact resume from the commit log.

    spark-submit --py-files dist/accountant_pdf_extract_spark.zip \\
        accountant_pdf_extract_spark/plans/job.py \\
        --input /data/interleaved --output /data/extracted \\
        --commit-log /data/extracted/_commit_log \\
        --salt-buckets 1024 --num-partitions 4096

Plan shape (one shuffle): scan → anti-join committed buckets (metadata
only — the committed set is a broadcast list, so resume pruning is a
filter that Iceberg/parquet partition pruning can push to the scan) →
salted repartition on hash(doc_id) → fused Arrow kernel → write
partitioned by bucket (dynamic overwrite = idempotent redo) → commit.
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accountant_pdf_extract_spark.plans.pipeline import SALT_COL, extract, salt
from accountant_pdf_extract_spark.sources.commit_log import CommitLog


_SALT_META = "_salt_meta.json"


def write_bucketed_input(
    df: DataFrame, path: str, salt_buckets: int = 1024
) -> None:
    """Persist the interleaved input physically partitioned by the salt
    bucket.  Resume then reads this table and the committed-bucket
    anti-filter becomes a PartitionFilter at the scan (verified by
    ``tests/test_resume.py::test_resume_partition_pruning``) — skipped
    buckets are never read, instead of read-then-dropped.

    A ``_salt_meta.json`` sidecar records the bucket count so
    ``read_bucketed_input`` can refuse a job run with a DIFFERENT
    count — the stored column would prune wholesale buckets that were
    only partially committed under the new modulus (silent data loss)."""
    import json
    import os

    # Never pass through a caller-supplied salt column: a foreign-modulus
    # _salt_bucket would make the sidecar lie about the stored bucket
    # count, and resume pruning would silently skip uncommitted docs.
    if SALT_COL in df.columns:
        df = df.drop(SALT_COL)
    salt(df, salt_buckets).write.mode("overwrite").partitionBy(SALT_COL).parquet(
        path
    )
    with open(os.path.join(path, _SALT_META), "w") as f:
        json.dump({"salt_buckets": int(salt_buckets)}, f)


def read_bucketed_input(
    spark: SparkSession, path: str, salt_buckets: int
) -> DataFrame:
    """Read a ``write_bucketed_input`` table, validating that the
    stored bucket count matches the job's — raises on mismatch or a
    missing sidecar (never silently trust a foreign bucket column)."""
    import json
    import os

    meta_path = os.path.join(path, _SALT_META)
    if not os.path.exists(meta_path):
        raise ValueError(
            f"{path} has no {_SALT_META}; only tables written by "
            "write_bucketed_input may be trusted for resume pruning"
        )
    with open(meta_path) as f:
        stored = int(json.load(f)["salt_buckets"])
    if stored != salt_buckets:
        raise ValueError(
            f"input at {path} was bucketed with salt_buckets={stored}, "
            f"but this job runs with salt_buckets={salt_buckets} — "
            "resume pruning would drop partially-committed documents"
        )
    return spark.read.parquet(path)


def run_job(
    spark: SparkSession,
    input_df: DataFrame,
    output_path: str,
    commit_log_path: str,
    salt_buckets: int = 1024,
    num_partitions: int | None = None,
    job_id: str = "job",
    trust_input_bucketing: bool = False,
) -> dict:
    """Returns {"processed_buckets": [...], "skipped": int, "snapshot_id": ...}.

    ``trust_input_bucketing``: only set True for input read via
    ``read_bucketed_input`` (which validates the stored bucket count).
    Otherwise a pre-existing ``_salt_bucket`` column is DROPPED and
    recomputed — a column bucketed under a different modulus would make
    resume pruning silently skip partially-committed documents."""
    log = CommitLog(commit_log_path)
    done = log.committed_buckets()
    if done:
        # resume guard: prior commits under a DIFFERENT bucket modulus
        # would make the NOT-IN filter below skip uncommitted docs
        # whose new bucket id collides with an old committed id —
        # exactly the hazard read_bucketed_input guards on the input
        # side.  Every snapshot records its modulus in lineage.
        prior = {
            s_.get("lineage", {}).get("salt_buckets")
            for s_ in log.snapshots()
        } - {None}
        if prior and prior != {str(salt_buckets)}:
            raise ValueError(
                f"commit log at {commit_log_path!r} was written with "
                f"salt_buckets={sorted(prior)} but this run uses "
                f"{salt_buckets}; resuming across a modulus change "
                "would silently skip documents — use the original "
                "value or a fresh commit log + output path"
            )

    if SALT_COL in input_df.columns and not trust_input_bucketing:
        input_df = input_df.drop(SALT_COL)
    salted_in = salt(input_df, salt_buckets)
    if done:
        # J3 resume: drop already-committed buckets.  The committed set
        # is small metadata → broadcast filter (prunes at the scan when
        # the salt is a partition column of the input table).
        salted_in = salted_in.where(~F.col(SALT_COL).isin(sorted(done)))

    t0 = time.monotonic()
    flat = extract(
        salted_in.select("doc_id", "spans"),
        salt_buckets=salt_buckets,
        num_partitions=num_partitions,
        keep_salt=True,
    )

    # Idempotent per-bucket overwrite: a redone bucket replaces only
    # its own partition directory.  Writer-scoped option, NOT a
    # session conf — flipping the session default would silently turn
    # every later full overwrite in this session into a partial one.
    (
        flat.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(SALT_COL)
        .parquet(output_path)
    )

    wall_ms = int((time.monotonic() - t0) * 1000)

    # Per-bucket lineage metrics from the (already materialized) output:
    # order-independent fingerprint + span/doc/field counts.  The output
    # is partitioned by SALT_COL, so the NOT-IN on committed buckets is a
    # PartitionFilter — previously committed bucket directories are never
    # read here, only the freshly written ones.
    from pyspark.errors import AnalysisException

    try:
        out = spark.read.parquet(output_path)
    except AnalysisException:
        # zero-row first run: only _SUCCESS on disk, no parquet
        # footers to infer a schema from — an empty result, not an
        # error; commit nothing and report zero processed buckets
        out = None
    stats = [] if out is None else (
        out.where(~F.col(SALT_COL).isin(sorted(done)) if done else F.lit(True))
        .groupBy(SALT_COL)
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_spans"),
            F.count("invoice_id").alias("n_fields"),
            F.sum(F.xxhash64("doc_id", "order").cast("decimal(38,0)")).alias("fp"),
        )
        .collect()
    )
    records = [
        {
            "partition_id": r[SALT_COL],
            "input_fingerprint": str(r["fp"]),
            "n_docs": r["n_docs"],
            "n_spans": r["n_spans"],
            "n_fields": r["n_fields"],
            # whole-job wall time, identical across this snapshot's
            # buckets (hence the name — per-bucket skew lives in the
            # Spark task metrics, not here)
            "job_wall_ms": wall_ms,
        }
        for r in stats
    ]
    lineage = {
        "job_id": job_id,
        "salt_buckets": str(salt_buckets),
        "engine": "accountant_pdf_extract_spark",
        # per-doc fault-isolation metric (accumulated during the write
        # action above): docs whose extraction raised and yielded no
        # spans.  At-least-once under task retries (accumulator in a
        # transformation) — an upper bound / alarm, not an exact ledger
        "dropped_docs": str(flat.dropped_docs_acc.value),
    }
    snapshot_id = log.commit(spark, records, lineage) if records else None
    return {
        "processed_buckets": sorted(r["partition_id"] for r in records),
        "skipped": len(done),
        "snapshot_id": snapshot_id,
        "wall_ms": wall_ms,
    }


def run_incremental_job(
    spark: SparkSession,
    table,
    output_path: str,
    cursor_path: str,
    salt_buckets: int = 1024,
    num_partitions: int | None = None,
) -> dict:
    """Snapshot-cursor incremental extraction over a ``DocTable``: the
    steady-state driver for a table that grows by commits — each run
    extracts ONLY the rows added since the stored cursor and lands
    them in the same salted sink, then advances the cursor.

    Mechanics:
    - The window (cursor → current) is split into MAXIMAL append-only
      segments at compaction boundaries (``read_incremental`` refuses
      across a compaction; compaction snapshots add no rows, so they
      are skipped, and rows committed before one are still emitted).
    - Each segment writes via the batch-keyed dynamic-overwrite sink
      with batch id = the segment's end sequence: a crashed/re-run
      segment REPLACES its own ``_batch_id`` partitions (idempotent),
      earlier windows are never touched.
    - The cursor file advances by atomic replace only AFTER all
      segment writes committed — crash anywhere re-runs the same
      window idempotently (exactly-once to the sink).

    Key-version semantics: a key appended in one run and upserted in a
    later one appears once per run, under increasing ``_batch_id`` —
    downstream consumers keep the max ``_batch_id`` row per doc (the
    standard CDC contract; within a single window the newest form
    already wins via the window's delete files).

    Deletions (``delete_where``) are retracted as TOMBSTONES: each
    window ``delete_where`` snapshot's keys land under
    ``<output>/_tombstones`` keyed by its sequence, written BEFORE the
    cursor advances.  The full consumer contract is therefore: live
    rows = max-``_batch_id`` row per doc, minus docs carrying a
    tombstone with ``_batch_id`` >= that row's batch.  (Upsert delete
    files need no tombstone — the replacement rows in the same batch
    win the max-batch race on their own.)"""
    import json
    import os
    import tempfile

    from accountant_pdf_extract_spark.streaming.sink import (
        batch_keyed_parquet_sink,
    )

    cur = table.current_snapshot()
    if cur is None:
        raise FileNotFoundError("table has no snapshots")
    cursor = None
    if os.path.exists(cursor_path):
        with open(cursor_path) as f:
            cursor = json.load(f)["snapshot_id"]
    if cursor == cur["snapshot_id"]:
        return {"segments": [], "skipped": True,
                "cursor": cur["snapshot_id"]}

    snaps = sorted(table.snapshots(), key=lambda s: s["sequence"])
    by_id = {s["snapshot_id"]: s for s in snaps}
    if cursor is not None and cursor not in by_id:
        raise FileNotFoundError(
            f"cursor snapshot {cursor!r} is not in the table history "
            "(expired?) — expire_snapshots must keep at least the last "
            "consumed snapshot, or delete the cursor file to force a "
            "full re-extraction"
        )
    from_seq = by_id[cursor]["sequence"] if cursor is not None else 0
    window = [s for s in snaps if from_seq < s["sequence"] <= cur["sequence"]]

    # maximal append-only segments, split at compaction snapshots:
    # a compaction closes the open segment and becomes the next
    # segment's from-anchor (it adds no rows itself, so it is skipped)
    segments: list[list] = []  # [from_id_or_None, to_snap]
    if cursor is None:
        # no cursor = first consumption: ONE full merge-on-read scan
        # of the current snapshot is the correct (and minimal) plan.
        # Walking the window segment-wise here was a silent-data-loss
        # trap: a LEADING compaction (the shape expire+compact leaves)
        # became the from-anchor, so the rewritten pre-compaction rows
        # were never extracted — and a compaction-only window produced
        # zero segments while still advancing the cursor.
        segments = [[None, cur]]
    else:
        seg_from: str | None = cursor
        open_seg: list | None = None
        for s in window:
            if "compaction_of" in s:
                open_seg = None
                seg_from = s["snapshot_id"]
            elif open_seg is None:
                open_seg = [seg_from, s]
                segments.append(open_seg)
            else:
                open_seg[1] = s

    sink = batch_keyed_parquet_sink(output_path, SALT_COL)
    done_segments = []
    for frm, to in segments:
        # metadata-only emptiness check: a segment of delete-only
        # snapshots adds no data files — nothing to extract (its
        # retraction is the tombstone pass below), skip the Spark job
        seg_from_seq = by_id[frm]["sequence"] if frm is not None else 0
        if not table.has_data_after(to, seg_from_seq):
            continue
        delta = (
            table.read_incremental(spark, frm, to["snapshot_id"])
            if frm is not None
            else table.read(spark, snapshot_id=to["snapshot_id"])
        )
        flat = extract(
            delta.select("doc_id", "spans"),
            salt_buckets=salt_buckets,
            num_partitions=num_partitions,
            keep_salt=True,
        )
        sink(flat, to["sequence"])
        done_segments.append(
            {"from": frm, "to": to["snapshot_id"], "batch_id": to["sequence"]}
        )

    # retract delete_where keys as tombstones (underscore-prefixed dir:
    # invisible to plain parquet reads of the sink).  Written before
    # the cursor advances, idempotent per snapshot like the segments.
    tombstones = []
    for s in window:
        if "deleted_where" not in s:
            continue
        dels = [
            d for d in s.get("delete_entries", [])
            if d["seq"] == s["sequence"]
        ]
        if not dels:
            continue
        keys = spark.read.parquet(*[d["path"] for d in dels]).distinct()
        tomb_sink = batch_keyed_parquet_sink(
            os.path.join(output_path, "_tombstones")
        )
        tomb_sink(keys, s["sequence"])
        tombstones.append(
            {"snapshot": s["snapshot_id"], "batch_id": s["sequence"]}
        )

    # atomic cursor advance, only after every segment write committed
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(cursor_path) or ".")
    with os.fdopen(fd, "w") as f:
        json.dump({"snapshot_id": cur["snapshot_id"]}, f)
    os.replace(tmp, cursor_path)
    return {"segments": done_segments, "tombstones": tombstones,
            "skipped": False, "cursor": cur["snapshot_id"]}


def main() -> None:
    from accountant_pdf_extract_spark.session import get_spark
    from accountant_pdf_extract_spark.sources.synth import synth_interleaved

    p = argparse.ArgumentParser()
    p.add_argument("--input", help="parquet dir of the interleaved table")
    p.add_argument("--synth-docs", type=int, default=0,
                   help="generate the input instead of reading it")
    p.add_argument("--output", required=True)
    p.add_argument("--commit-log", required=True)
    p.add_argument("--salt-buckets", type=int, default=1024)
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--job-id", default="job")
    p.add_argument("--master", default=None)
    args = p.parse_args()
    if not args.input and not args.synth_docs:
        p.error("one of --input or --synth-docs is required")

    spark = get_spark(app=f"extract-{args.job_id}", master=args.master)
    import os

    trusted = False
    if args.synth_docs:
        inp = synth_interleaved(spark, args.synth_docs)
    elif os.path.exists(os.path.join(args.input, _SALT_META)):
        # bucket-partitioned input: validate the stored bucket count
        # (raises on mismatch), then let resume prune at the scan
        inp = read_bucketed_input(spark, args.input, args.salt_buckets)
        trusted = True
    else:
        inp = spark.read.parquet(args.input)
    res = run_job(
        spark,
        inp,
        args.output,
        args.commit_log,
        salt_buckets=args.salt_buckets,
        num_partitions=args.num_partitions,
        job_id=args.job_id,
        trust_input_bucketing=trusted,
    )
    print(res)
    spark.stop()


if __name__ == "__main__":
    main()
