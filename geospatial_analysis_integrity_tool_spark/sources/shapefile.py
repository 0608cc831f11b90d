"""Minimal ESRI shapefile (.shp) reader/writer — the reference's primary
input format (embedded shapelib: shpopen.c; import driver shape_import.c).

Implements the public SHP spec (ESRI whitepaper) for the two shape types the
fixtures need — Point (1) and PolyLine (3) — with no external libraries:

* ``write_point_shp`` / ``write_polyline_shp`` — fixture writers (pure
  struct packing; big-endian record headers, little-endian payloads).
* ``read_shp`` — the distributed path: ``spark.read.format("binaryFile")``
  over a glob, then an Arrow-batched kernel parses each file's bytes with
  numpy ``frombuffer`` into feature rows (file, record number, shape type,
  xs, ys).  One task per file — shapefiles are bounded (2 GB by format), so
  per-file parallelism matches GAIT's per-layer ingest (SHAPE_IGNORE_LIMIT
  share_linux.h:134 caps layer size similarly).

This is a subset reader (no .shx/.dbf, no M/Z variants); the graft's primary
source is the pages table — this exists for §2.1 format parity.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SHPT_POINT = 1
SHPT_POLYLINE = 3


def _header(shape_type: int, total_words: int, bbox: tuple[float, float, float, float]) -> bytes:
    return (
        struct.pack(">i", 9994)
        + b"\x00" * 20
        + struct.pack(">i", total_words)
        + struct.pack("<ii", 1000, shape_type)
        + struct.pack("<4d", *bbox)
        + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
    )


def write_point_shp(path: str, points: list[tuple[float, float]]) -> None:
    records = b""
    for i, (x, y) in enumerate(points, 1):
        content = struct.pack("<i2d", SHPT_POINT, x, y)
        records += struct.pack(">ii", i, len(content) // 2) + content
    xs = [p[0] for p in points] or [0.0]
    ys = [p[1] for p in points] or [0.0]
    total_words = (100 + len(records)) // 2
    with open(path, "wb") as f:
        f.write(_header(SHPT_POINT, total_words, (min(xs), min(ys), max(xs), max(ys))))
        f.write(records)


def write_polyline_shp(path: str, lines: list[list[tuple[float, float]]]) -> None:
    records = b""
    allx = [x for ln in lines for x, _ in ln] or [0.0]
    ally = [y for ln in lines for _, y in ln] or [0.0]
    for i, ln in enumerate(lines, 1):
        xs = [x for x, _ in ln]
        ys = [y for _, y in ln]
        content = struct.pack(
            "<i4dii", SHPT_POLYLINE, min(xs), min(ys), max(xs), max(ys), 1, len(ln)
        )
        content += struct.pack("<i", 0)  # single part starting at 0
        for x, y in ln:
            content += struct.pack("<2d", x, y)
        records += struct.pack(">ii", i, len(content) // 2) + content
    total_words = (100 + len(records)) // 2
    with open(path, "wb") as f:
        f.write(
            _header(
                SHPT_POLYLINE, total_words, (min(allx), min(ally), max(allx), max(ally))
            )
        )
        f.write(records)


def parse_shp_bytes(data: bytes, source: str) -> pd.DataFrame:
    """One .shp file -> rows (source, recno, shape_type, xs, ys)."""
    if len(data) < 100 or struct.unpack(">i", data[:4])[0] != 9994:
        raise ValueError(f"{source}: not a shapefile (bad file code)")
    rows = []
    off = 100
    n = len(data)
    while off + 8 <= n:
        recno, content_words = struct.unpack(">ii", data[off : off + 8])
        off += 8
        content = data[off : off + content_words * 2]
        off += content_words * 2
        if len(content) < 4:
            break
        stype = struct.unpack("<i", content[:4])[0]
        if stype == SHPT_POINT:
            x, y = struct.unpack("<2d", content[4:20])
            rows.append((source, recno, stype, [x], [y]))
        elif stype == SHPT_POLYLINE:
            numparts, numpoints = struct.unpack("<ii", content[36:44])
            pts_off = 44 + 4 * numparts
            pts = np.frombuffer(
                content, dtype="<f8", count=2 * numpoints, offset=pts_off
            ).reshape(numpoints, 2)
            rows.append(
                (source, recno, stype, pts[:, 0].tolist(), pts[:, 1].tolist())
            )
        elif stype == 0:  # null shape
            rows.append((source, recno, stype, [], []))
        else:
            raise ValueError(f"{source}: unsupported shape type {stype}")
    return pd.DataFrame(
        rows, columns=["source", "recno", "shape_type", "xs", "ys"]
    )


SHP_SCHEMA = (
    "source string, recno int, shape_type int, xs array<double>, ys array<double>"
)


def read_shp(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed shapefile scan: binaryFile source + parse kernel."""
    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():  # per FILE, not per feature
                yield parse_shp_bytes(bytes(row["content"]), row["path"])

    return files.select("path", "content").mapInPandas(run, schema=SHP_SCHEMA)
