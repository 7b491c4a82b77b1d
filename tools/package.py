"""Build the spark-submit --py-files artifact at deploy time:

    python -m tools.package   →  dist/accountant_pdf_extract_spark.zip

The zip is NOT committed (dist/ is gitignored): a committed binary
drifts from the source (ADVICE r1) — build it fresh when deploying.
``tests/test_bench_contract.py::test_package_zip_matches_source`` pins
that the built artifact byte-equals the package tree.
"""

from __future__ import annotations

import pathlib
import zipfile

ROOT = pathlib.Path(__file__).parent.parent
PKG = ROOT / "accountant_pdf_extract_spark"


def build(out: pathlib.Path) -> pathlib.Path:
    """Write the --py-files zip to ``out``; returns the path."""
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(PKG.rglob("*.py")):
            zf.write(py, py.relative_to(ROOT))
    return out


def main() -> None:
    out = build(ROOT / "dist" / "accountant_pdf_extract_spark.zip")
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
