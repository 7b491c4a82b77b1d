"""Shared bench-harness plumbing: taskset re-exec pinning and the
BENCH/BASELINE.md sentinel-section splice.  One copy — a fix to the
pinning env-guard or the splice edge cases applies to every bench."""

from __future__ import annotations

import os
import shutil
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_MD = os.path.join(REPO_ROOT, "BENCH", "BASELINE.md")


def repin(cores: int) -> None:
    """Re-exec the current process under ``taskset`` confined to the
    first `cores` ids of the ALLOWED set (core ids need not start at 0
    inside a container cpuset; a host with fewer usable cores just
    runs on what it has).  Also restores the repo root on sys.path:
    after re-exec, ``python -m bench.x`` becomes ``python bench/x.py``
    whose script-dir sys.path entry is bench/, not the root."""
    if os.environ.get("_BENCH_PINNED") != "1":
        try:
            allowed = sorted(os.sched_getaffinity(0))
        except AttributeError:  # non-Linux — run unpinned
            allowed = None
        if allowed is not None:
            os.environ["_BENCH_PINNED"] = "1"
            if len(allowed) > cores and shutil.which("taskset") is not None:
                pick = ",".join(str(c) for c in allowed[:cores])
                os.execvp(
                    "taskset",
                    ["taskset", "-c", pick, sys.executable, *sys.argv],
                )
    if REPO_ROOT not in sys.path:
        sys.path.insert(0, REPO_ROOT)


def splice_section(begin: str, end: str, section: str,
                   path: str = BASELINE_MD) -> None:
    """Replace the begin..end sentinel block in `path` (or append the
    block at EOF if the sentinels aren't present yet).  `section` must
    itself start with `begin` and end with `end`."""
    with open(path) as f:
        txt = f.read()
    if begin in txt and end in txt:
        pre = txt[: txt.index(begin)]
        post = txt[txt.index(end) + len(end):]
        txt = pre + section + post
    else:
        txt = txt.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(txt)
