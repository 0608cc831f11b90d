"""North-rule packaging evidence: the pipeline runs via REAL
``spark-submit --py-files`` with the package imported from the zip only —
no repo checkout on the import path (the cluster-worker condition).

Builds dist/gait_spark.zip (tools/make_pyfiles.py), copies the entry script
to a temp dir OUTSIDE the repo, and launches ``spark-submit --py-files``
from there; asserts the pipeline completes, emits its metrics JSON, and
that a second run against the same out_dir resumes from the checkpoint
manifest (same condition count, completed partitions skipped).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)


def _run(workdir: str, zip_path: str, out_dir: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[8]",
            "--py-files", zip_path,
            "rp.py", "800", out_dir,
        ],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_spark_submit_pyfiles_runs_and_resumes():
    import sys

    sys.path.insert(0, REPO)
    from tools.make_pyfiles import build

    zip_path = build()
    with tempfile.TemporaryDirectory(prefix="gait_submit_") as d:
        shutil.copy(os.path.join(REPO, "tools", "run_pipeline.py"),
                    os.path.join(d, "rp.py"))
        out_dir = os.path.join(d, "out")
        m1 = _run(d, zip_path, out_dir)
        assert m1["n_pages"] == 800
        assert m1["n_conditions"] > 0
        assert m1["lineage_partitions"] > 0
        # resume: same out_dir, manifest skips completed partitions,
        # results identical
        m2 = _run(d, zip_path, out_dir)
        assert m2["n_conditions"] == m1["n_conditions"]
        assert m2["lineage_partitions"] == m1["lineage_partitions"]
