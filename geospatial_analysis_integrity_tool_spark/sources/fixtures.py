"""Shared fixture/warehouse paths for file-format gate queries.

Format round-trip gates (shp/dbf, Grid-ASCII, DTED) write a small fixture at
query time and read it back through the DISTRIBUTED binary readers.  The
fixture must live on storage every executor can read: driver-local /tmp only
works in local mode (ADVICE round 2).  ``fixture_dir`` resolves to
``$SPARK_GRAFT_WAREHOUSE`` when set — point it at a shared filesystem
(HDFS/NFS/object-store mount) on a real cluster — and falls back to the
repo-local ``spark-warehouse/fixtures`` for local runs.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixture_dir(name: str) -> str:
    base = os.environ.get(
        "SPARK_GRAFT_WAREHOUSE",
        os.path.join(_REPO_ROOT, "spark-warehouse", "fixtures"),
    )
    path = os.path.join(base, name)
    os.makedirs(path, exist_ok=True)
    return path
