#!/usr/bin/env python
"""Build dist/pdf_extractor_spark.zip for spark-submit --py-files.

The zip contains the package importable at the archive root — executors
unpack it onto sys.path, so `from pdf_extractor_spark...` works on every
worker (north rule: launched via spark-submit --py-files).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "pdf_extractor_spark")
OUT = os.path.join(REPO, "dist", "pdf_extractor_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    names = zipfile.ZipFile(OUT).namelist()
    print(f"wrote {OUT} ({len(names)} files)")


if __name__ == "__main__":
    main()
