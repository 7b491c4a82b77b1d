"""Iceberg-shaped commit log (S5, SURVEY.md §2.1): per-partition
lineage + metrics records with atomic JSON snapshots for exact resume
(``BASELINE.json:6,14``).

Locally this is partitioned parquet + atomic-rename JSON snapshots —
the same protocol surface an Iceberg commit would serve (append-only
metadata, snapshot pinning, committed-partition listing).  On a real
cluster the sink swaps to ``df.writeTo("catalog.db.log").append()``
with ``iceberg-spark-runtime`` on the classpath; the engine code path
is identical (documented swap, SURVEY.md §0.2: no Iceberg jar + no
network in this sandbox).

Protocol (two-level commit):
1. task output for bucket B lands under ``output/bucket=B/`` (dynamic
   partition overwrite → idempotent redo);
2. only after the write action succeeds is a commit record for B
   appended here, then a snapshot JSON is atomically renamed into
   place.  A killed job therefore resumes exactly: committed buckets
   are skipped via anti-join, uncommitted buckets are redone
   idempotently (deterministic kernels, seeded synth).

Durability scope, stated honestly: the exact-resume guarantee covers
PROCESS failure (kill/crash of the job), the case the protocol is
exercised against.  Across an OS crash or power loss it is weaker
than a real table format: the snapshot JSON is fsynced before the
rename, but the bucket parquet it certifies is written by Spark
WITHOUT fsync, so the journal could persist a seal whose data pages
were still dirty.  Production table formats inherit close-durability
from HDFS/S3; on local disk, a power-loss-safe variant would need to
fsync the bucket files (and directories) before sealing.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from accountant_pdf_extract_spark.schema import COMMIT_LOG_SCHEMA


class CommitLog:
    def __init__(self, path: str) -> None:
        self.path = path
        self.records_dir = os.path.join(path, "records")
        self.snapshot_dir = os.path.join(path, "snapshots")
        os.makedirs(self.records_dir, exist_ok=True)
        os.makedirs(self.snapshot_dir, exist_ok=True)

    # -- read side ---------------------------------------------------------

    def snapshots(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.snapshot_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.snapshot_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def committed_buckets(self) -> set[int]:
        done: set[int] = set()
        for snap in self.snapshots():
            done.update(snap["buckets"])
        return done

    def records(self, spark: SparkSession) -> DataFrame:
        """Per-bucket records of SEALED snapshots only: a commit that
        crashed after writing its record parquet but before the atomic
        snapshot rename leaves an orphan record file — including it
        would double-count the bucket once it is redone."""
        sealed = {s["snapshot_id"] for s in self.snapshots()}
        files = [
            os.path.join(self.records_dir, f)
            for f in os.listdir(self.records_dir)
            if f.endswith(".parquet")
            and f[: -len(".parquet")] in sealed
        ]
        if not files:
            return spark.createDataFrame([], COMMIT_LOG_SCHEMA)
        return spark.read.schema(COMMIT_LOG_SCHEMA).parquet(*files)

    # -- write side --------------------------------------------------------

    def commit(
        self, spark: SparkSession, records: list[dict], lineage: dict[str, str]
    ) -> str:
        """Append per-bucket records + seal with an atomic snapshot.
        Returns the snapshot id."""
        snapshot_id = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        rows = [
            {
                "partition_id": int(r["partition_id"]),
                "input_fingerprint": str(r["input_fingerprint"]),
                "n_docs": int(r["n_docs"]),
                "n_spans": int(r["n_spans"]),
                "n_fields": int(r["n_fields"]),
                "job_wall_ms": int(r["job_wall_ms"]),
                "lineage": dict(lineage),
                "snapshot_id": snapshot_id,
            }
            for r in records
        ]
        df = spark.createDataFrame(rows, COMMIT_LOG_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.records_dir, f"{snapshot_id}.parquet")
        )
        snap = {
            "snapshot_id": snapshot_id,
            "buckets": sorted(int(r["partition_id"]) for r in records),
            "lineage": lineage,
            "ts_ms": int(time.time() * 1000),
        }
        tmp = os.path.join(self.snapshot_dir, f".{snapshot_id}.json.tmp")
        final = os.path.join(self.snapshot_dir, f"{snapshot_id}.json")
        with open(tmp, "w") as f:
            json.dump(snap, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # atomic seal
        return snapshot_id

    def drop_snapshots(self, snapshot_ids: set[str]) -> None:
        """Test hook: simulate a crash that lost some commits."""
        for sid in snapshot_ids:
            p = os.path.join(self.snapshot_dir, f"{sid}.json")
            if os.path.exists(p):
                os.remove(p)
