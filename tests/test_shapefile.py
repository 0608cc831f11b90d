"""Shapefile + DBF reader round-trips (public SHP/Xbase spec subset)."""

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


def test_shp_multipart_split_never_flattened(spark):
    """A 2-part polyline must yield 2 rows — flattening would add a phantom
    segment between part ends (feeds false SEGLEN/intersections)."""
    from geospatial_analysis_integrity_tool_spark.sources.shapefile import (
        SHPT_POLYLINE,
        read_shp,
        write_multipart_shp,
    )

    d = tempfile.mkdtemp(prefix="gait_shp_")
    parts = [
        [(0.0, 0.0), (1.0, 0.0)],
        [(5.0, 5.0), (6.0, 5.0), (7.0, 5.5)],
    ]
    write_multipart_shp(os.path.join(d, "multi.shp"), SHPT_POLYLINE, [parts])
    rows = sorted(read_shp(spark, d + "/*.shp").collect(), key=lambda r: r.part)
    assert [(r.recno, r.part) for r in rows] == [(1, 0), (1, 1)]
    assert list(zip(rows[0].xs, rows[0].ys)) == parts[0]
    assert list(zip(rows[1].xs, rows[1].ys)) == parts[1]


def test_shp_polygon_with_hole_and_z(spark):
    from geospatial_analysis_integrity_tool_spark.sources.shapefile import (
        SHPT_POLYLINEZ,
        read_shp,
        write_multipart_shp,
        write_polygon_shp,
    )

    d = tempfile.mkdtemp(prefix="gait_shp_")
    outer = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0), (1.0, 1.0)]
    write_polygon_shp(os.path.join(d, "area.shp"), [[outer, hole]])
    zline = [[(10.0, 40.0, 100.0), (10.01, 40.0, 105.5)]]
    write_multipart_shp(os.path.join(d, "zline.shp"), SHPT_POLYLINEZ, [zline])

    rows = read_shp(spark, d + "/*.shp").collect()
    polys = sorted((r for r in rows if r.shape_type == 5), key=lambda r: r.part)
    assert [len(p.xs) for p in polys] == [5, 5]
    assert list(zip(polys[1].xs, polys[1].ys)) == hole
    zl = [r for r in rows if r.shape_type == SHPT_POLYLINEZ][0]
    assert zl.zs == [100.0, 105.5]


def test_shp_rejects_garbage(spark):
    from geospatial_analysis_integrity_tool_spark.sources.shapefile import (
        parse_shp_bytes,
    )

    with pytest.raises(ValueError, match="bad file code"):
        parse_shp_bytes(b"not a shapefile at all padding padding padding " * 4, "x")


def test_dbf_roundtrip(spark):
    from geospatial_analysis_integrity_tool_spark.sources.shapefile import (
        read_dbf,
        write_dbf,
    )

    d = tempfile.mkdtemp(prefix="gait_dbf_")
    fields = [("FCODE", "C", 5, 0), ("WID", "N", 8, 0), ("HGT", "N", 10, 2)]
    recs = [("AP030", 12, 3.5), ("GB005", 7, 11.25), ("BH140", None, 0.0)]
    write_dbf(os.path.join(d, "attrs.dbf"), fields, recs)
    rows = read_dbf(spark, d + "/*.dbf").collect()
    by = {(r.recno, r.attr): (r.dtype, r.value) for r in rows}
    assert by[(1, "FCODE")] == ("C", "AP030")
    assert by[(1, "WID")] == ("N", "12")
    assert by[(2, "HGT")] == ("N", "11.25")
    assert by[(3, "WID")] == ("N", "")  # NULL -> blank
    assert len(rows) == 9


def test_shp_multipoint_split_to_point_rows(spark):
    from geospatial_analysis_integrity_tool_spark.sources.shapefile import (
        SHPT_MULTIPOINT,
        SHPT_MULTIPOINTZ,
        ShpStreamWriter,
        read_shp,
    )

    d = tempfile.mkdtemp(prefix="gait_shp_")
    w = ShpStreamWriter(os.path.join(d, "mp.shp"), SHPT_MULTIPOINT)
    w.add_multipoint([(12.5, 41.9), (12.6, 41.8), (12.7, 41.7)])
    w.add_multipoint([(13.0, 42.0)])
    w.close()
    wz = ShpStreamWriter(os.path.join(d, "mpz.shp"), SHPT_MULTIPOINTZ)
    wz.add_multipoint([(12.5, 41.9, 100.0), (12.6, 41.8, 200.0)])
    wz.close()
    rows = read_shp(spark, d + "/*.shp").collect()
    mp = sorted(
        (r for r in rows if r.shape_type == SHPT_MULTIPOINT),
        key=lambda r: (r.recno, r.part),
    )
    # each point becomes its OWN row (shape_import.c:4756 split)
    assert [(r.recno, r.part, r.xs[0], r.ys[0]) for r in mp] == [
        (1, 0, 12.5, 41.9), (1, 1, 12.6, 41.8), (1, 2, 12.7, 41.7),
        (2, 0, 13.0, 42.0),
    ]
    mpz = sorted(
        (r for r in rows if r.shape_type == SHPT_MULTIPOINTZ),
        key=lambda r: r.part,
    )
    assert [(r.xs[0], r.zs[0]) for r in mpz] == [(12.5, 100.0), (12.6, 200.0)]


def test_shp_multipatch_parts_split(spark):
    from geospatial_analysis_integrity_tool_spark.sources.shapefile import (
        SHPT_MULTIPATCH,
        ShpStreamWriter,
        read_shp,
    )

    d = tempfile.mkdtemp(prefix="gait_shp_")
    ring = [(10.0, 40.0, 5.0), (10.1, 40.0, 5.0), (10.1, 40.1, 5.0),
            (10.0, 40.0, 5.0)]
    strip = [(11.0, 41.0, 0.0), (11.0, 41.1, 1.0), (11.1, 41.0, 2.0),
             (11.1, 41.1, 3.0)]
    w = ShpStreamWriter(os.path.join(d, "patch.shp"), SHPT_MULTIPATCH)
    w.add_multipatch([ring, strip], [2, 0])  # outer ring + triangle strip
    w.close()
    rows = sorted(read_shp(spark, d + "/*.shp").collect(), key=lambda r: r.part)
    assert [r.shape_type for r in rows] == [SHPT_MULTIPATCH] * 2
    assert rows[0].xs == [10.0, 10.1, 10.1, 10.0]
    assert rows[0].zs == [5.0, 5.0, 5.0, 5.0]
    assert rows[1].ys == [41.0, 41.1, 41.0, 41.1]
    assert rows[1].zs == [0.0, 1.0, 2.0, 3.0]
