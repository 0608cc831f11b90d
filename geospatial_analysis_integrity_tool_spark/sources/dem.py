"""DEM source readers — GAIT's grid import stage (SURVEY.md §2.1 DEM scan).

Reference: GAIT imports DTED, Grid-ASCII, and GeoTIFF DEMs into flat
elevation bins (import decls share_linux.h:1046-1050; GeoTIFF via GDAL in
import_geotiff.cpp:29).  This module implements the PUBLIC ESRI ASCII grid
format (the `import_gridascii` path) natively:

    ncols 50
    nrows 50
    xllcorner 10.0
    yllcorner 40.0
    cellsize 0.01
    NODATA_value -9999
    <nrows lines of ncols values, NORTH to SOUTH>

``read_gridascii`` is the distributed path: ``binaryFile`` source + a numpy
``loadtxt``-style kernel per file; rows are flipped so ``elevs`` is row-major
from the SOUTH-WEST corner — the same layout as the engine's tiles table
(MultiGrids.Elevs semantics, share_linux.h:332-345).

DTED and GeoTIFF need binary/codec plumbing not present in this container;
their import would slot in as additional parse kernels behind the same
(binaryFile -> tiles row) shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def write_gridascii(
    path: str,
    elevs_sw_rowmajor: np.ndarray,  # (nrows, ncols), row 0 = SOUTH
    x0: float,
    y0: float,
    cellsize: float,
    nodata: float = -9999.0,
) -> None:
    nrows, ncols = elevs_sw_rowmajor.shape
    with open(path, "w") as f:
        f.write(f"ncols {ncols}\n")
        f.write(f"nrows {nrows}\n")
        f.write(f"xllcorner {x0!r}\n")
        f.write(f"yllcorner {y0!r}\n")
        f.write(f"cellsize {cellsize!r}\n")
        f.write(f"NODATA_value {nodata!r}\n")
        for r in range(nrows - 1, -1, -1):  # file runs north -> south
            f.write(" ".join(f"{v:.1f}" for v in elevs_sw_rowmajor[r]) + "\n")


def parse_gridascii_bytes(data: bytes, source: str) -> pd.DataFrame:
    """One .asc file -> one tiles row (source, ncols, nrows, x0, y0,
    cellsize, nodata, elevs) with elevs row-major from the SW corner."""
    text = data.decode("ascii")
    lines = text.splitlines()
    hdr: dict[str, float] = {}
    body_start = 0
    for i, ln in enumerate(lines):
        parts = ln.split()
        if len(parts) == 2 and parts[0].lower() in (
            "ncols", "nrows", "xllcorner", "yllcorner", "cellsize", "nodata_value"
        ):
            hdr[parts[0].lower()] = float(parts[1])
            body_start = i + 1
        else:
            break
    for req in ("ncols", "nrows", "xllcorner", "yllcorner", "cellsize"):
        if req not in hdr:
            raise ValueError(f"{source}: missing Grid-ASCII header field {req}")
    ncols = int(hdr["ncols"])
    nrows = int(hdr["nrows"])
    vals = np.array(" ".join(lines[body_start:]).split(), dtype=np.float64)
    if len(vals) != ncols * nrows:
        raise ValueError(
            f"{source}: expected {ncols * nrows} posts, found {len(vals)}"
        )
    grid_ns = vals.reshape(nrows, ncols)  # file order: north -> south
    grid_sw = grid_ns[::-1]               # row 0 = south
    return pd.DataFrame(
        [
            (
                source,
                ncols,
                nrows,
                hdr["xllcorner"],
                hdr["yllcorner"],
                hdr["cellsize"],
                hdr.get("nodata_value", -9999.0),
                grid_sw.reshape(-1).tolist(),
            )
        ],
        columns=[
            "source", "ncols", "nrows", "x0", "y0", "cellsize", "nodata", "elevs",
        ],
    )


GRIDASCII_SCHEMA = (
    "source string, ncols int, nrows int, x0 double, y0 double,"
    " cellsize double, nodata double, elevs array<double>"
)


def read_gridascii(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed Grid-ASCII scan: binaryFile source + parse kernel,
    one task per file (DEM tiles are bounded)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield parse_gridascii_bytes(bytes(row["content"]), row["path"])

    return files.select("path", "content").mapInPandas(run, schema=GRIDASCII_SCHEMA)
