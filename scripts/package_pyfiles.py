"""Build dist/bdtopo2refhydro_spark.zip for `spark-submit --py-files`
(north rule: "packaged for spark-submit --py-files on a multi-executor
cluster"). Pure stdlib; the zip contains only the package sources, rooted
so `import bdtopo2refhydro_spark` works on every executor.

Usage: python scripts/package_pyfiles.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "bdtopo2refhydro_spark"


def build(out_dir: str = "dist") -> str:
    out_dir = os.path.join(ROOT, out_dir)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
