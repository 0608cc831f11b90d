"""Raster overlay: exact-post join and bilinear kernel (InterpLinearElev)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_bilinear_kernel_exact_on_plane():
    from geospatial_analysis_integrity_tool_spark.operators.raster import (
        bilinear_sample_kernel,
    )

    # bilinear must reproduce an affine surface exactly
    ny, nx = 10, 12
    gy, gx = np.mgrid[0:ny, 0:nx]
    elevs = 2.0 * gx + 3.0 * gy + 5.0
    lon = np.array([0.25, 3.75, 10.5])
    lat = np.array([0.5, 2.25, 8.0])
    got = bilinear_sample_kernel(lon, lat, elevs, 0.0, 0.0, 1.0, 1.0)
    want = 2.0 * lon + 3.0 * lat + 5.0
    assert np.allclose(got, want, atol=1e-12)


def test_overlay_bilinear_dataframe(spark):
    from geospatial_analysis_integrity_tool_spark.operators.raster import (
        overlay_sample_bilinear,
    )
    from geospatial_analysis_integrity_tool_spark.queries.overlay import (
        POSTS,
        POST_DEG,
        build_raster_tiles,
    )

    tiles = build_raster_tiles(spark)
    pts = spark.createDataFrame(
        [(1, 10.123, 40.237), (2, 12.401, 43.118)], "pid int, lon double, lat double"
    )
    out = overlay_sample_bilinear(
        pts, tiles, x_origin=10.0, y_origin=40.0, post_deg=POST_DEG, posts_per_tile=POSTS
    ).collect()
    assert len(out) == 2
    for r in out:
        assert 0.0 <= r.elev_bilin <= 400.0  # within the DEM value range


def test_overlay_exact_matches_formula(spark):
    from geospatial_analysis_integrity_tool_spark.operators.raster import (
        overlay_sample_exact,
    )
    from geospatial_analysis_integrity_tool_spark.queries.overlay import (
        POSTS,
        POST_DEG,
        build_raster_tiles,
    )

    tiles = build_raster_tiles(spark)
    pts = spark.createDataFrame(
        [(i, 10.0 + i * 0.137 % 3.9, 40.0 + i * 0.211 % 3.9) for i in range(50)],
        "pid int, lon double, lat double",
    )
    out = overlay_sample_exact(
        pts, tiles, x_origin=10.0, y_origin=40.0, post_deg=POST_DEG, posts_per_tile=POSTS
    ).collect()
    assert len(out) == 50
    for r in out:
        want = ((r.gx * 7919 + r.gy * 104729) % 4000) / 10.0
        assert r.elev == want
