"""North-rule deployment path: the job must run via
``spark-submit --py-files <zip>`` with the package supplied ONLY by the
freshly-built zip (spark-submit puts the script's own directory —
plans/ — on sys.path, not the repo root, so a broken/stale zip fails
the import)."""

from __future__ import annotations

import pathlib
import subprocess

ROOT = pathlib.Path(__file__).parent.parent


def test_spark_submit_py_files_job(tmp_path: pathlib.Path):
    from tools.package import build

    zip_path = build(tmp_path / "pkg.zip")
    out = tmp_path / "out"
    log = tmp_path / "log"
    res = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", str(zip_path),
            str(ROOT / "accountant_pdf_extract_spark" / "plans" / "job.py"),
            "--synth-docs", "200",
            "--output", str(out),
            "--commit-log", str(log),
            "--salt-buckets", "8",
            "--num-partitions", "8",
            "--job-id", "submit-test",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo root: the zip must supply the package
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "'processed_buckets'" in res.stdout, res.stdout[-1000:]

    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM parquet_scan('{out}/**/*.parquet', hive_partitioning=1)"
    ).fetchone()[0]
    assert n > 0
