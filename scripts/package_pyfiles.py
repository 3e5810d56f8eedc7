"""Build the --py-files archive for cluster submission (north_rule: "run
via spark-submit --py-files on a multi-executor cluster").

On a real multi-executor cluster the package must ship to executors so
python workers can unpickle the Arrow-UDF closures (detector kernels,
invariant decode); locally the driver process already has it on sys.path.

    python scripts/package_pyfiles.py          # -> dist/dpf_spark.zip
    spark-submit --py-files dist/dpf_spark.zip \
        --master spark://<master>:7077 jobs/validate.py --data <dir>
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "drift_detection_pibic___framework_spark"
OUT = os.path.join(ROOT, "dist", "dpf_spark.zip")


def build() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
    return OUT


if __name__ == "__main__":
    print(build())
