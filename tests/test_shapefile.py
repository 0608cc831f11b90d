"""Shapefile reader round-trip (public SHP spec subset)."""

from __future__ import annotations

import os
import tempfile

import pytest


def test_shp_point_roundtrip(spark):
    from geospatial_analysis_integrity_tool_spark.sources.shapefile import (
        read_shp,
        write_point_shp,
    )

    d = tempfile.mkdtemp(prefix="gait_shp_")
    pts = [(12.5, 41.9), (-0.1275, 51.507), (139.69, 35.689)]
    write_point_shp(os.path.join(d, "cities.shp"), pts)
    rows = sorted(read_shp(spark, d + "/*.shp").collect(), key=lambda r: r.recno)
    assert [(r.xs[0], r.ys[0]) for r in rows] == pts
    assert all(r.shape_type == 1 for r in rows)


def test_shp_polyline_roundtrip_and_mixed_files(spark):
    from geospatial_analysis_integrity_tool_spark.sources.shapefile import (
        read_shp,
        write_point_shp,
        write_polyline_shp,
    )

    d = tempfile.mkdtemp(prefix="gait_shp_")
    lines = [
        [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)],
        [(10.0, 40.0), (10.001, 40.0)],
    ]
    write_polyline_shp(os.path.join(d, "roads.shp"), lines)
    write_point_shp(os.path.join(d, "poi.shp"), [(5.0, 5.0)])
    df = read_shp(spark, d + "/*.shp")
    rows = df.collect()
    assert len(rows) == 3
    roads = sorted(
        (r for r in rows if r.shape_type == 3), key=lambda r: r.recno
    )
    assert list(zip(roads[0].xs, roads[0].ys)) == lines[0]
    assert list(zip(roads[1].xs, roads[1].ys)) == lines[1]


def test_shp_rejects_garbage(spark):
    from geospatial_analysis_integrity_tool_spark.sources.shapefile import (
        parse_shp_bytes,
    )

    with pytest.raises(ValueError, match="bad file code"):
        parse_shp_bytes(b"not a shapefile at all padding padding padding " * 4, "x")
