"""Single-process cProfile of the extraction kernel (verdict r4 item 9).

Builds a heavy synthetic corpus in-process (no Spark — the kernel is a
plain Arrow-batch function, so profiling it outside an executor measures
exactly what each task core pays) and prints the top per-doc cost
centers.  Run pinned to avoid scheduler noise::

    taskset -c 0 python -m bench.profile_kernel [n_docs]

The printed table is the source for the "flagship kernel profile"
section of BENCH/BASELINE.md.
"""
from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

if "" not in sys.path:  # taskset re-exec drops the repo root
    sys.path.insert(0, "")

import pyarrow as pa

from accountant_pdf_extract_spark.operators.kernel import extract_batches
from accountant_pdf_extract_spark.sources.synth import (
    DEFAULT_WORDS,
    _spans_to_arrow,
    build_doc,
)


def build_corpus(n_docs: int, seed: int = 42, batch_rows: int = 256):
    batches = []
    for lo in range(0, n_docs, batch_rows):
        rows = [
            (f"doc-{i:08d}", build_doc(i, seed, DEFAULT_WORDS, heavy=True))
            for i in range(lo, min(lo + batch_rows, n_docs))
        ]
        batches.append(_spans_to_arrow(rows))
    return batches


def run(batches) -> int:
    n = 0
    for out in extract_batches(iter(batches)):
        n += out.num_rows
    return n


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    batches = build_corpus(n_docs)
    run(batches[:2])  # warm: regex compile, lru caches, import tails

    t0 = time.perf_counter()
    rows = run(batches)
    wall = time.perf_counter() - t0

    prof = cProfile.Profile()
    prof.enable()
    run(batches)
    prof.disable()

    buf = io.StringIO()
    stats = pstats.Stats(prof, stream=buf)
    stats.sort_stats("cumulative").print_stats(25)
    total_tt = sum(e[2] for e in stats.stats.values())  # sum of tottime

    print(buf.getvalue())
    print(
        f"docs={n_docs} out_rows={rows} wall={wall:.3f}s "
        f"per_doc_ms={1000 * wall / n_docs:.3f} "
        f"profiled_tottime={total_tt:.2f}s"
    )


if __name__ == "__main__":
    main()
