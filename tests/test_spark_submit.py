"""spark-submit --py-files smoke: the north rule's submission mode.

Runs the real ``spark-submit`` binary against a COPY of jobs/validate.py in
a scratch directory, with the package shipped ONLY as the
``--py-files dist/dpf_spark.zip`` archive built by scripts/package_pyfiles.
Because the job file's own ``sys.path.insert`` then points at the scratch
dir (no package there) and the child gets no PYTHONPATH, every
``drift_detection_pibic___framework_spark`` import — driver side AND the
Arrow-UDF closures unpickled in python workers — must resolve from the zip,
exactly as it would shipping to real executors.  Asserts the golden verdict
matrix (FIXTURES.md §5: 80 checks / 18 failing at sf0.001, exit 1).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_golden_matrix(tmp_path):
    sys.path.insert(0, ROOT)
    from drift_detection_pibic___framework_spark.sources import (
        generators as G)
    from scripts.package_pyfiles import build

    data = G.ensure_fixtures("sf0.001")
    zip_path = build()
    assert os.path.exists(zip_path)

    job = tmp_path / "jobs" / "validate.py"
    job.parent.mkdir()
    shutil.copyfile(os.path.join(ROOT, "jobs", "validate.py"), job)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", zip_path, str(job),
         "--data", os.path.abspath(data)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)

    assert proc.returncode == 1, (
        f"expected exit 1 (golden matrix has failures)\n"
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}")
    assert "80 checks, 18 failing" in proc.stdout, proc.stdout[-3000:]
    # import isolation really held: the package is not importable from the
    # scratch cwd without the zip
    ctl = subprocess.run(
        [sys.executable, "-c",
         "import drift_detection_pibic___framework_spark"],
        cwd=tmp_path, env=env, capture_output=True, text=True)
    assert ctl.returncode != 0, "package leaked onto the child path"
