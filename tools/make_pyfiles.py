"""Build dist/ocr_project_spark.zip for spark-submit --py-files.

Zips the package sources only (no tests, no bytecode) with fixed
timestamps so the artifact is byte-reproducible.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "ocr_project_spark")
OUT = os.path.join(ROOT, "dist", "ocr_project_spark.zip")


def build(out_path: str = OUT) -> str:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(PKG):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, ROOT)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, rel in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    print(build())
