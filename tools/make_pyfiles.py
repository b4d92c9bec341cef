"""Package proj_spark for spark-submit --py-files.

Usage:
    python tools/make_pyfiles.py [out.zip]
    spark-submit --py-files proj_spark.zip your_job.py

The zip contains the pure-python package plus the vendored EPSG catalog
(proj_spark/data/epsg_catalog.json.gz — resolved lazily on first
authority-code lookup); kernel constants are computed at operator
construction on the driver and shipped to executors inside the
pandas-UDF closures.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "proj_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                # package code + vendored data: the EPSG catalog and the
                # classic init files (data/init/nad27 etc., no extension)
                if (f.endswith((".py", ".json.gz"))
                        or os.path.basename(root) == "init"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, ROOT))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "proj_spark.zip")
    print(build(out))
