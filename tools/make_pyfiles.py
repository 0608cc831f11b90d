"""Build the --py-files artifact (north rule: "runs via spark-submit
--py-files on a multi-executor cluster").

Zips the ``geospatial_analysis_integrity_tool_spark`` package into
``dist/gait_spark.zip`` so driver AND executors import it from the zip with
no repo checkout on the workers:

    python tools/make_pyfiles.py
    spark-submit --py-files dist/gait_spark.zip tools/run_pipeline.py 10000 /tmp/out
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "geospatial_analysis_integrity_tool_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "gait_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(src):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
