"""Streaming vs batch cost on the same corpus (VERDICT r3 item 8):
time ``stream_extract``'s Trigger.AvailableNow drain against the
plain batch ``extract`` on an identical on-disk input, and record the
streaming overhead (micro-batch scheduling + checkpoint + per-batch
sink commits) as one table row in BENCH/BASELINE.md.  No target —
this is recorded cost, not a gate.

    python -m bench.streamrate [--docs 20000] [--cores 8]
                               [--max-files 64]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

# bootstrap BEFORE the package import: after the taskset re-exec the
# process runs as `python bench/x.py`, whose script-dir sys.path
# entry is bench/, so `bench._util` would not resolve
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
from bench._util import repin, splice_section  # noqa: E402

_BEGIN = "<!-- streamrate-section -->"
_END = "<!-- /streamrate-section -->"




def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=20000)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--max-files", type=int, default=64)
    args = p.parse_args()
    repin(args.cores)

    from accountant_pdf_extract_spark.plans.pipeline import extract
    from accountant_pdf_extract_spark.schema import INPUT_SCHEMA
    from accountant_pdf_extract_spark.session import get_spark
    from accountant_pdf_extract_spark.sources.synth import synth_interleaved
    from accountant_pdf_extract_spark.streaming.ingest import stream_extract

    work = tempfile.mkdtemp(prefix="streamrate_")
    inp = os.path.join(work, "input")
    spark = get_spark(
        app="bench-streamrate", master=f"local[{args.cores}]",
        shuffle_partitions=args.cores * 4,
    )
    spark.range(10_000).selectExpr("sum(id)").collect()

    # heavy corpus on disk, many files so AvailableNow forms several
    # micro-batches (the scheduling overhead being measured)
    synth_interleaved(spark, args.docs, seed=42, heavy=True).repartition(
        256
    ).write.mode("overwrite").parquet(inp)

    df = spark.read.schema(INPUT_SCHEMA).parquet(inp)

    # batch leg (warm + measured)
    extract(df.limit(64), salt_buckets=256, num_partitions=4).write.format(
        "noop"
    ).mode("overwrite").save()
    t0 = time.monotonic()
    extract(df, salt_buckets=256, num_partitions=args.cores * 8).write.mode(
        "overwrite"
    ).parquet(os.path.join(work, "batch_out"))
    batch_s = time.monotonic() - t0

    # streaming leg: full AvailableNow drain, same kernels, same input
    t0 = time.monotonic()
    # num_partitions sized to the PER-MICRO-BATCH data volume (each
    # batch sees maxFilesPerTrigger/256 of the corpus), not the whole
    # corpus — otherwise every micro-batch pays the full task-launch
    # fan-out on a fraction of the rows
    q = stream_extract(
        spark,
        inp,
        os.path.join(work, "stream_out"),
        os.path.join(work, "ckpt"),
        salt_buckets=256,
        num_partitions=args.cores * 2,
    )
    q.awaitTermination()
    stream_s = time.monotonic() - t0
    n_batches = len(q.recentProgress)
    rows_stream = spark.read.parquet(os.path.join(work, "stream_out")).count()
    rows_batch = spark.read.parquet(os.path.join(work, "batch_out")).count()
    assert rows_stream == rows_batch, (rows_stream, rows_batch)

    out = {
        "docs": args.docs,
        "cores": args.cores,
        "batch_wall_s": round(batch_s, 2),
        "stream_wall_s": round(stream_s, 2),
        "micro_batches": n_batches,
        "batch_docs_s": round(args.docs / batch_s, 1),
        "stream_docs_s": round(args.docs / stream_s, 1),
        "stream_overhead_pct": round(100 * (stream_s / batch_s - 1), 1),
        "rows": rows_stream,
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)

    section = f"""{_BEGIN}

## Streaming drain vs batch on the same corpus (python -m bench.streamrate)

{out['docs']:,} heavy docs, {out['cores']} pinned cores, identical
kernels and parquet sink; streaming = Trigger.AvailableNow drain
through foreachBatch with checkpointing ({out['micro_batches']}
micro-batches at maxFilesPerTrigger=64).  Output row counts verified
equal.

| leg | wall (s) | docs/s |
|---|---|---|
| batch extract | {out['batch_wall_s']} | {out['batch_docs_s']} |
| streaming AvailableNow drain | {out['stream_wall_s']} | {out['stream_docs_s']} |

Streaming overhead: **{out['stream_overhead_pct']}%** (micro-batch
scheduling + checkpoint commits + per-batch sink overwrites; recorded
cost, no target).

{_END}"""
    splice_section(_BEGIN, _END, section)


if __name__ == "__main__":
    main()
