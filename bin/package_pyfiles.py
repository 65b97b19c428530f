#!/usr/bin/env python
"""Package the engine as a --py-files zip for spark-submit.

Usage: python bin/package_pyfiles.py [out.zip]
Also importable: make_pyfiles_zip(out_path) -> out_path.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "raster_processor_spark"


def make_pyfiles_zip(out_path: str) -> str:
    """Zip the engine package (sources only) so spark-submit can ship it to
    the driver and every executor via --py-files."""
    pkg_root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "raster_processor_spark.zip"
    )
    print(make_pyfiles_zip(out))
