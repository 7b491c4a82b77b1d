"""Kill/resume test (SURVEY.md §5.5, FIXTURES.md §3): drop half the
commit snapshots after a full run, re-run, and assert (a) the final
output is identical to an uninterrupted run and (b) only the missing
buckets were recomputed."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from accountant_pdf_extract_spark.plans.job import run_job
from accountant_pdf_extract_spark.sources.commit_log import CommitLog
from accountant_pdf_extract_spark.sources.synth import synth_interleaved

N_DOCS = 120
BUCKETS = 8


def _collect(spark, path):
    df = spark.read.parquet(path)
    return sorted(
        tuple(r)
        for r in df.select(
            "doc_id", "kind", "text", "media_ref", "order"
        ).collect()
    )


def test_exact_resume(spark, tmp_path: pathlib.Path):
    inp = synth_interleaved(spark, N_DOCS, seed=11, partitions=8)

    # uninterrupted reference run
    ref_out = str(tmp_path / "ref_out")
    res_ref = run_job(
        spark, inp, ref_out, str(tmp_path / "ref_log"),
        salt_buckets=BUCKETS, num_partitions=8, job_id="ref",
    )
    assert res_ref["skipped"] == 0
    reference = _collect(spark, ref_out)
    assert reference

    # interrupted run: full run, then lose half the committed buckets
    out = str(tmp_path / "out")
    log_path = str(tmp_path / "log")
    res1 = run_job(
        spark, inp, out, log_path,
        salt_buckets=BUCKETS, num_partitions=8, job_id="run1",
    )
    log = CommitLog(log_path)
    all_buckets = set(res1["processed_buckets"])
    lost = sorted(all_buckets)[: len(all_buckets) // 2]

    # simulate the crash: wipe the snapshot AND re-commit only the kept
    # buckets (i.e. the crash happened before the snapshot sealed)
    snaps = log.snapshots()
    assert len(snaps) == 1
    kept_records = [
        {
            "partition_id": b, "input_fingerprint": "x", "n_docs": 0,
            "n_spans": 0, "n_fields": 0, "job_wall_ms": 0,
        }
        for b in sorted(all_buckets - set(lost))
    ]
    log.drop_snapshots({snaps[0]["snapshot_id"]})
    log.commit(spark, kept_records, {"job_id": "run1-partial"})
    assert log.committed_buckets() == all_buckets - set(lost)

    # resume: only the lost buckets may be recomputed
    res2 = run_job(
        spark, inp, out, log_path,
        salt_buckets=BUCKETS, num_partitions=8, job_id="run2",
    )
    assert res2["processed_buckets"] == sorted(lost)
    assert res2["skipped"] == len(all_buckets) - len(lost)

    # byte-identical final result
    assert _collect(spark, out) == reference

    # a third run is a no-op
    res3 = run_job(
        spark, inp, out, log_path,
        salt_buckets=BUCKETS, num_partitions=8, job_id="run3",
    )
    assert res3["processed_buckets"] == []


def test_resume_partition_pruning(spark, tmp_path: pathlib.Path):
    """With the input physically partitioned by the salt bucket, the
    committed-bucket anti-filter must prune at the scan (a
    PartitionFilter), not post-scan — plus end-to-end: resuming over
    the bucketed input recomputes only the missing buckets."""
    import pytest

    from accountant_pdf_extract_spark.plans.job import (
        read_bucketed_input,
        write_bucketed_input,
    )
    from accountant_pdf_extract_spark.plans.pipeline import SALT_COL, salt

    inp = synth_interleaved(spark, 80, seed=5, partitions=4)
    bucketed = str(tmp_path / "bucketed_in")
    write_bucketed_input(inp, bucketed, salt_buckets=BUCKETS)
    # bucket-count mismatch must refuse loudly, never prune silently
    with pytest.raises(ValueError, match="salt_buckets"):
        read_bucketed_input(spark, bucketed, BUCKETS * 2)
    binp = read_bucketed_input(spark, bucketed, BUCKETS)
    assert SALT_COL in binp.columns

    done = {0, 1, 2, 3}
    filtered = salt(binp, BUCKETS).where(~F.col(SALT_COL).isin(sorted(done)))
    filtered.createOrReplaceTempView("pruned_in")
    plan = spark.sql("EXPLAIN FORMATTED SELECT * FROM pruned_in").first()[0]
    scan = plan[plan.index("PartitionFilters") :]
    assert SALT_COL in scan.splitlines()[0], scan.splitlines()[0]

    # end-to-end: full run over the bucketed input, lose half the
    # commits, resume — only lost buckets recomputed, output identical
    out = str(tmp_path / "pout")
    log_path = str(tmp_path / "plog")
    res1 = run_job(spark, binp, out, log_path,
                   salt_buckets=BUCKETS, num_partitions=8, job_id="b1",
                   trust_input_bucketing=True)
    reference = _collect(spark, out)
    log = CommitLog(log_path)
    all_buckets = set(res1["processed_buckets"])
    lost = sorted(all_buckets)[: len(all_buckets) // 2]
    snaps = log.snapshots()
    kept = [
        {"partition_id": b, "input_fingerprint": "x", "n_docs": 0,
         "n_spans": 0, "n_fields": 0, "job_wall_ms": 0}
        for b in sorted(all_buckets - set(lost))
    ]
    log.drop_snapshots({snaps[0]["snapshot_id"]})
    log.commit(spark, kept, {"job_id": "b1-partial"})
    res2 = run_job(spark, binp, out, log_path,
                   salt_buckets=BUCKETS, num_partitions=8, job_id="b2",
                   trust_input_bucketing=True)
    assert res2["processed_buckets"] == sorted(lost)
    assert _collect(spark, out) == reference

    # an untrusted frame with a foreign salt column gets re-salted, not
    # silently trusted: a mod-16 column under a mod-8 job still yields
    # the correct full result
    wrong = salt(inp, BUCKETS * 2)
    out2 = str(tmp_path / "wout")
    run_job(spark, wrong, out2, str(tmp_path / "wlog"),
            salt_buckets=BUCKETS, num_partitions=8, job_id="w1")
    assert _collect(spark, out2) == reference

    # write_bucketed_input fed a frame carrying a FOREIGN-modulus salt
    # column must recompute the salt under its own modulus — otherwise
    # the sidecar lies and resume pruning can skip uncommitted docs
    foreign_bucketed = str(tmp_path / "foreign_bucketed")
    write_bucketed_input(wrong, foreign_bucketed, salt_buckets=BUCKETS)
    clean = {
        r["doc_id"]: r[SALT_COL]
        for r in read_bucketed_input(spark, bucketed, BUCKETS)
        .select("doc_id", SALT_COL).collect()
    }
    refed = {
        r["doc_id"]: r[SALT_COL]
        for r in read_bucketed_input(spark, foreign_bucketed, BUCKETS)
        .select("doc_id", SALT_COL).collect()
    }
    assert refed == clean


def test_salt_distribution(spark):
    """Salting evidence: doc counts per bucket stay within a sane
    envelope for uniform ids (no empty/overloaded buckets at 16x
    docs-per-bucket)."""
    inp = synth_interleaved(spark, 400, seed=3, partitions=8)
    counts = (
        inp.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(16)).cast("int").alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )
    per = {r["b"]: r["count"] for r in counts}
    assert len(per) == 16
    assert max(per.values()) < 4 * min(per.values())


def test_commit_log_records_roundtrip(spark, tmp_path: pathlib.Path):
    log = CommitLog(str(tmp_path / "clog"))
    recs = [
        {"partition_id": 3, "input_fingerprint": "abc", "n_docs": 10,
         "n_spans": 55, "n_fields": 7, "job_wall_ms": 123},
        {"partition_id": 5, "input_fingerprint": "def", "n_docs": 2,
         "n_spans": 9, "n_fields": 1, "job_wall_ms": 123},
    ]
    sid = log.commit(spark, recs, {"job_id": "t", "attempt": "1"})
    df = log.records(spark)
    rows = {r["partition_id"]: r for r in df.collect()}
    assert set(rows) == {3, 5}
    assert rows[3]["n_spans"] == 55
    assert rows[3]["lineage"]["job_id"] == "t"
    assert rows[5]["snapshot_id"] == sid
    assert log.committed_buckets() == {3, 5}


def test_commit_log_empty_records(spark, tmp_path: pathlib.Path):
    log = CommitLog(str(tmp_path / "clog2"))
    assert log.records(spark).count() == 0
    assert log.committed_buckets() == set()


def test_incremental_job_extracts_only_new_snapshots(spark, tmp_path):
    """Snapshot-cursor incremental extraction: first run processes the
    full table; later runs process only window-added docs, split into
    append-only segments around a compaction (whose rewritten rows
    must NOT be re-emitted); an up-to-date cursor is a no-op."""
    from accountant_pdf_extract_spark.plans.job import run_incremental_job
    from accountant_pdf_extract_spark.schema import INPUT_SCHEMA
    from accountant_pdf_extract_spark.sources.catalog import DocTable

    def docs(*ids):
        return spark.createDataFrame(
            [
                (d, [{"kind": "text", "text": f"ledger {d}", "media_ref": "",
                      "offset": 0}])
                for d in ids
            ],
            INPUT_SCHEMA,
        )

    tbl = DocTable(str(tmp_path / "tbl"))
    out = str(tmp_path / "out")
    cursor = str(tmp_path / "cursor.json")

    tbl.append(docs("d1", "d2"))
    r1 = run_incremental_job(
        spark, tbl, out, cursor, salt_buckets=8, num_partitions=2)
    assert not r1["skipped"] and len(r1["segments"]) == 1

    def by_batch():
        rows = spark.read.parquet(out).select("_batch_id", "doc_id").collect()
        got = {}
        for r in rows:
            got.setdefault(int(r["_batch_id"]), set()).add(r["doc_id"])
        return got

    assert by_batch() == {1: {"d1", "d2"}}

    tbl.append(docs("d3"))               # seq 2
    tbl.compact(spark, target_files=1)   # seq 3 (rewrites d1-d3)
    tbl.append(docs("d4"))               # seq 4
    r2 = run_incremental_job(
        spark, tbl, out, cursor, salt_buckets=8, num_partitions=2)
    assert [s["batch_id"] for s in r2["segments"]] == [2, 4]
    # d1/d2 appear once (batch 1); the compaction's rewrite of them is
    # never re-emitted; d3 and d4 land under their own segment batches
    assert by_batch() == {1: {"d1", "d2"}, 2: {"d3"}, 4: {"d4"}}

    r3 = run_incremental_job(
        spark, tbl, out, cursor, salt_buckets=8, num_partitions=2)
    assert r3["skipped"] and by_batch() == {1: {"d1", "d2"}, 2: {"d3"},
                                            4: {"d4"}}


def test_incremental_job_retracts_deletes_as_tombstones(spark, tmp_path):
    """delete_where keys must be retracted: they land under
    <output>/_tombstones keyed by the delete snapshot's sequence, the
    underscore dir stays invisible to plain reads of the sink, and the
    documented consumer contract (max-batch row minus tombstoned docs)
    yields the table's live set."""
    from accountant_pdf_extract_spark.plans.job import run_incremental_job
    from accountant_pdf_extract_spark.schema import INPUT_SCHEMA
    from accountant_pdf_extract_spark.sources.catalog import DocTable

    def docs(*ids):
        return spark.createDataFrame(
            [(d, [{"kind": "text", "text": f"ledger {d}", "media_ref": "",
                   "offset": 0}]) for d in ids],
            INPUT_SCHEMA,
        )

    tbl = DocTable(str(tmp_path / "tbl"))
    out = str(tmp_path / "out")
    cursor = str(tmp_path / "cursor.json")
    tbl.append(docs("d1", "d2"))                              # seq 1
    run_incremental_job(spark, tbl, out, cursor, salt_buckets=8,
                        num_partitions=2)
    tbl.delete_where(spark, "doc_id = 'd1'", "doc_id")        # seq 2
    r = run_incremental_job(spark, tbl, out, cursor, salt_buckets=8,
                            num_partitions=2)
    assert r["segments"] == [] and r["tombstones"] == [
        {"snapshot": tbl.current_snapshot()["snapshot_id"], "batch_id": 2}]

    sink = spark.read.parquet(out)
    assert "_tombstones" not in [p for p in sink.columns]
    assert sorted(set(r["doc_id"] for r in sink.collect())) == ["d1", "d2"]
    tomb = spark.read.parquet(f"{out}/_tombstones")
    assert [(r["doc_id"], int(r["_batch_id"])) for r in tomb.collect()] == [
        ("d1", 2)]

    # consumer contract: latest batch per doc, minus tombstones >= it
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    latest = (
        sink.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("_batch_id"),
                                                     F.desc("order"))),
        ).where(F.col("rn") == 1).select("doc_id", "_batch_id")
    )
    live = latest.join(
        tomb.select("doc_id", F.col("_batch_id").alias("_tomb_b")),
        "doc_id", "left",
    ).where(
        F.col("_tomb_b").isNull() | (F.col("_tomb_b") < F.col("_batch_id"))
    )
    assert [r["doc_id"] for r in live.collect()] == ["d2"]
    # idempotent re-run after table advances by a no-op? cursor is
    # current -> skipped, tombstones untouched
    assert run_incremental_job(spark, tbl, out, cursor, salt_buckets=8,
                               num_partitions=2)["skipped"]


def test_incremental_first_consumption_after_compaction(spark, tmp_path):
    """Silent-data-loss regression (r4 review): a FRESH consumer (no
    cursor) whose window STARTS with a compaction — the post-
    maintenance shape expire+compact leaves — must extract the full
    table, not anchor on the compaction and drop everything it
    rewrote.  Also the compaction-only-window case."""
    from accountant_pdf_extract_spark.plans.job import run_incremental_job
    from accountant_pdf_extract_spark.schema import INPUT_SCHEMA
    from accountant_pdf_extract_spark.sources.catalog import DocTable

    def docs(*ids):
        return spark.createDataFrame(
            [(d, [{"kind": "text", "text": f"ledger {d}", "media_ref": "",
                   "offset": 0}]) for d in ids],
            INPUT_SCHEMA,
        )

    tbl = DocTable(str(tmp_path / "tbl"))
    tbl.append(docs("d1", "d2"))
    tbl.compact(spark, target_files=1)
    tbl.expire_snapshots(keep_last=1)   # history = [compaction] only
    out = str(tmp_path / "out")
    r = run_incremental_job(
        spark, tbl, out, str(tmp_path / "c.json"),
        salt_buckets=8, num_partitions=2,
    )
    assert len(r["segments"]) == 1
    got = {row["doc_id"] for row in spark.read.parquet(out).collect()}
    assert got == {"d1", "d2"}

    # compaction FIRST then an append: fresh consumer still gets all
    tbl2 = DocTable(str(tmp_path / "tbl2"))
    tbl2.append(docs("a1"))
    tbl2.compact(spark, target_files=1)
    tbl2.expire_snapshots(keep_last=1)
    tbl2.append(docs("a2"))
    out2 = str(tmp_path / "out2")
    r2 = run_incremental_job(
        spark, tbl2, out2, str(tmp_path / "c2.json"),
        salt_buckets=8, num_partitions=2,
    )
    assert len(r2["segments"]) == 1
    got2 = {row["doc_id"] for row in spark.read.parquet(out2).collect()}
    assert got2 == {"a1", "a2"}


def test_run_job_refuses_salt_bucket_modulus_change(spark, tmp_path):
    """Resuming a commit log written under a different salt_buckets
    must raise, not silently skip colliding bucket ids."""
    import pytest

    from accountant_pdf_extract_spark.plans.job import run_job
    from accountant_pdf_extract_spark.schema import INPUT_SCHEMA

    inp = spark.createDataFrame(
        [(f"d{i}", [{"kind": "text", "text": f"ledger {i}",
                     "media_ref": "", "offset": 0}]) for i in range(20)],
        INPUT_SCHEMA,
    )
    out = str(tmp_path / "out")
    log = str(tmp_path / "log")
    r1 = run_job(spark, inp, out, log, salt_buckets=16, num_partitions=2)
    assert r1["snapshot_id"] is not None
    with pytest.raises(ValueError, match="salt_buckets"):
        run_job(spark, inp, out, log, salt_buckets=8, num_partitions=2)
    # same modulus resumes fine (no-op: everything committed)
    r2 = run_job(spark, inp, out, log, salt_buckets=16, num_partitions=2)
    assert r2["processed_buckets"] == []


def test_run_job_zero_row_output_returns_empty(spark, tmp_path):
    """A first run whose extraction yields ZERO rows (every span
    invalid) must return an empty result, not crash on the
    unreadable empty output dir."""
    from accountant_pdf_extract_spark.plans.job import run_job
    from accountant_pdf_extract_spark.schema import INPUT_SCHEMA

    inp = spark.createDataFrame(
        [("d1", [{"kind": "bogus", "text": "x", "media_ref": "",
                  "offset": 0}]),
         ("d2", [{"kind": "text", "text": "   ", "media_ref": "",
                  "offset": 0}])],
        INPUT_SCHEMA,
    )
    r = run_job(
        spark, inp, str(tmp_path / "out"), str(tmp_path / "log"),
        salt_buckets=8, num_partitions=2,
    )
    assert r["processed_buckets"] == [] and r["snapshot_id"] is None
