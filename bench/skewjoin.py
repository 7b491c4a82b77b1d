"""Hot-key join benchmark: measures the salted join (operators/
skewjoin.salted_join) against the naive shuffle join on a
deliberately skewed key distribution, with per-task skew evidence
from the event log.

    python -m bench.skewjoin [--rows 4000000] [--hot-frac 0.3]
                             [--buckets 32] [--cores 8]

Setup (disclosed, not hidden): the small side would auto-broadcast at
this scale, so ``autoBroadcastJoinThreshold=-1`` forces the shuffle
join — the regime this operator exists for is a dim table too big to
broadcast at 100 TB.  AQE is disabled so the naive leg shows its raw
reducer skew (AQE's skew split only helps sort-merge joins; the
salted plan needs no runtime rescue).  The whole process is
taskset-pinned like every other bench (CLAUDE.md).

Appends/updates its section inside BENCH/BASELINE.md's PRESERVE
region (between its own begin/end sentinels, so scaling.py rewrites
keep it and re-runs replace it in place).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
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

_BEGIN = "<!-- skewjoin-section -->"
_END = "<!-- /skewjoin-section -->"




def _task_stats(evdir: str, t0_ms: float, t1_ms: float) -> dict:
    """max/median task ms of the heaviest stage inside [t0, t1]."""
    stage_tasks: dict[int, list[int]] = {}
    for root, _dirs, files in os.walk(evdir):
        for fn in files:
            if "appstatus" in fn:
                continue
            with open(os.path.join(root, fn)) as f:
                for line in f:
                    if '"SparkListenerTaskEnd"' not in line:
                        continue
                    ev = json.loads(line)
                    info = ev.get("Task Info", {})
                    lt = info.get("Launch Time", 0)
                    if not (t0_ms - 500 <= lt <= t1_ms + 500):
                        continue
                    dur = info.get("Finish Time", 0) - lt
                    stage_tasks.setdefault(ev.get("Stage ID"), []).append(dur)
    if not stage_tasks:
        return {"task_ms_median": 0, "task_ms_max": 0, "n_tasks": 0}
    heavy = max(stage_tasks.values(), key=sum)
    return {
        "task_ms_median": statistics.median(heavy),
        "task_ms_max": max(heavy),
        "n_tasks": len(heavy),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=4_000_000)
    p.add_argument("--hot-frac", type=float, default=0.3)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--n-keys", type=int, default=1024)
    args = p.parse_args()
    repin(args.cores)

    from pyspark.sql import functions as F

    from accountant_pdf_extract_spark.operators.skewjoin import salted_join
    from accountant_pdf_extract_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="evlog_skew_")
    spark = get_spark(
        app="bench-skewjoin",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores * 4,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(10_000).selectExpr("sum(id)").collect()

    hot_mod = max(1, round(1 / args.hot_frac))
    big = (
        spark.range(args.rows)
        .select(
            F.when(F.col("id") % hot_mod == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(args.n_keys)))
            .cast("long")
            .alias("key"),
            F.col("id").alias("rid"),
            (F.col("id") * 17 % 1000).alias("payload"),
        )
        .persist()
    )
    big.count()  # materialize the input outside the timed window
    small = (
        spark.range(args.n_keys)
        .select(F.col("id").alias("key"), (F.col("id") % 7).alias("tag"))
        .persist()
    )
    small.count()

    def timed(df) -> tuple[float, dict, int]:
        t0 = time.monotonic()
        e0 = time.time() * 1000
        n = df.groupBy("tag").count().count()  # forces the join fully
        wall = time.monotonic() - t0
        stats = _task_stats(evdir, e0, time.time() * 1000)
        return wall, stats, n

    results = {}
    # warm both plans once, then measure in alternating order
    for name, build in (
        ("naive", lambda: big.join(small, "key")),
        ("salted", lambda: salted_join(
            big, small, "key", salt_buckets=args.buckets, tiebreak="rid")),
    ):
        build().groupBy("tag").count().count()
        wall, stats, _ = timed(build())
        results[name] = {"wall_s": round(wall, 2), **stats}

    # row-identity spot check (cheap aggregate equality)
    a = big.join(small, "key").agg(
        F.count("*"), F.sum("payload"), F.sum("tag")).collect()[0]
    b = salted_join(
        big, small, "key", salt_buckets=args.buckets, tiebreak="rid"
    ).agg(F.count("*"), F.sum("payload"), F.sum("tag")).collect()[0]
    assert tuple(a) == tuple(b), (a, b)

    out = {
        "rows": args.rows,
        "hot_frac": round(1 / hot_mod, 3),
        "n_keys": args.n_keys,
        "salt_buckets": args.buckets,
        "cores": args.cores,
        **{f"{k}_{m}": v for k, r in results.items() for m, v in r.items()},
    }
    print(json.dumps(out))
    spark.stop()

    _write_section(out)


def _write_section(out: dict) -> None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "BASELINE.md",
    )
    nv = out["naive_task_ms_max"] / max(out["naive_task_ms_median"], 1)
    sv = out["salted_task_ms_max"] / max(out["salted_task_ms_median"], 1)
    section = f"""{_BEGIN}

## Hot-key join: salted vs naive shuffle join (python -m bench.skewjoin)

{out['rows']:,} rows, {out['hot_frac']:.0%} of them on ONE hot key
({out['n_keys']} keys total), {out['cores']} pinned cores, broadcast
disabled (the 100 TB regime: dim too big to broadcast), AQE off so
the naive reducer skew is visible.

| plan | wall (s) | join-stage tasks | median task (ms) | max task (ms) | max/median |
|---|---|---|---|---|---|
| naive shuffle join | {out['naive_wall_s']} | {out['naive_n_tasks']} | {out['naive_task_ms_median']:.0f} | {out['naive_task_ms_max']} | {nv:.1f} |
| salted_join ({out['salt_buckets']} buckets, rid tiebreak) | {out['salted_wall_s']} | {out['salted_n_tasks']} | {out['salted_task_ms_median']:.0f} | {out['salted_task_ms_max']} | {sv:.1f} |

Row-identity verified (count + two checksums equal across plans).
The salt is deterministic per row content (key + tiebreak id) — safe
under partial stage retries, unlike position-derived salts.

{_END}"""
    splice_section(_BEGIN, _END, section, path)


if __name__ == "__main__":
    main()
