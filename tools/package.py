"""Build the spark-submit --py-files artifact:

    python -m tools.package   →  dist/accountant_pdf_extract_spark.zip
"""

from __future__ import annotations

import pathlib
import zipfile

ROOT = pathlib.Path(__file__).parent.parent
PKG = ROOT / "accountant_pdf_extract_spark"


def main() -> None:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "accountant_pdf_extract_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(PKG.rglob("*.py")):
            zf.write(py, py.relative_to(ROOT))
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
