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


def write_bucketed_input(
    df: DataFrame, path: str, salt_buckets: int = 1024
) -> None:
    """Persist the interleaved input physically partitioned by the salt
    bucket.  Resume then reads this table and the committed-bucket
    anti-filter becomes a PartitionFilter at the scan (verified by
    ``tests/test_resume.py::test_resume_partition_pruning``) — skipped
    buckets are never read, instead of read-then-dropped."""
    salt(df, salt_buckets).write.mode("overwrite").partitionBy(SALT_COL).parquet(
        path
    )


def run_job(
    spark: SparkSession,
    input_df: DataFrame,
    output_path: str,
    commit_log_path: str,
    salt_buckets: int = 1024,
    num_partitions: int | None = None,
    job_id: str = "job",
) -> dict:
    """Returns {"processed_buckets": [...], "skipped": int, "snapshot_id": ...}."""
    log = CommitLog(commit_log_path)
    done = log.committed_buckets()

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

    # Idempotent per-bucket overwrite: a redone bucket replaces only its
    # own partition directory.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    flat.write.mode("overwrite").partitionBy(SALT_COL).parquet(output_path)

    wall_ms = int((time.monotonic() - t0) * 1000)

    # Per-bucket lineage metrics from the (already materialized) output:
    # order-independent fingerprint + span/doc/field counts.  The output
    # is partitioned by SALT_COL, so the NOT-IN on committed buckets is a
    # PartitionFilter — previously committed bucket directories are never
    # read here, only the freshly written ones.
    out = spark.read.parquet(output_path)
    stats = (
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
        # spans — recorded so data loss is auditable from the log
        "dropped_docs": str(flat.dropped_docs_acc.value),
    }
    snapshot_id = log.commit(spark, records, lineage) if records else None
    return {
        "processed_buckets": sorted(r["partition_id"] for r in records),
        "skipped": len(done),
        "snapshot_id": snapshot_id,
        "wall_ms": wall_ms,
    }


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

    spark = get_spark(app=f"extract-{args.job_id}", master=args.master)
    if args.synth_docs:
        inp = synth_interleaved(spark, args.synth_docs)
    else:
        # No forced schema: a bucket-partitioned input (written by
        # write_bucketed_input) must keep its _salt_bucket partition
        # column so resume prunes at the scan.  extract() still
        # validates doc_id+spans via assert_input_schema.
        inp = spark.read.parquet(args.input)
    res = run_job(
        spark,
        inp,
        args.output,
        args.commit_log,
        salt_buckets=args.salt_buckets,
        num_partitions=args.num_partitions,
        job_id=args.job_id,
    )
    print(res)
    spark.stop()


if __name__ == "__main__":
    main()
