"""Unit tests for the GAIT-frame geodesy kernels (SURVEY.md §5.2 item 1)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geospatial_analysis_integrity_tool_spark.functions import geodesy as g


def test_meters_per_degree_equator():
    mlon, mlat = g.meters_per_degree_np(np.array([0.0]))
    assert mlon[0] == pytest.approx(111319.5)
    assert mlat == 111319.5


def test_equirect_dist_known():
    # 1 deg of latitude = exactly one WGS84degreeLength in GAIT's frame
    d = g.equirect_dist_m_np(10.0, 40.0, 10.0, 41.0)
    assert d == pytest.approx(111319.5)
    # 1 deg of longitude at 60N = half a degree length (cos 60 = 0.5)
    d = g.equirect_dist_m_np(10.0, 60.0, 11.0, 60.0)
    assert d == pytest.approx(111319.5 * 0.5, rel=1e-9)


def test_not_haversine():
    # GAIT's equirectangular differs from haversine measurably at long range;
    # assert we reproduce the equirectangular value, not the geodesic one.
    d = g.equirect_dist_m_np(0.0, 0.0, 10.0, 10.0)
    R = 6371000.0
    lat1 = lat2 = None
    phi1, phi2 = math.radians(0.0), math.radians(10.0)
    dphi = phi2 - phi1
    dl = math.radians(10.0)
    a = math.sin(dphi / 2) ** 2 + math.cos(phi1) * math.cos(phi2) * math.sin(dl / 2) ** 2
    haversine = 2 * R * math.asin(math.sqrt(a))
    assert abs(float(d) - haversine) > 1000.0  # clearly different formulas


def test_truncate3():
    v = g.truncate3_np(np.array([1.23456, -1.23456, 0.0009999]))
    assert list(v) == [1.234, -1.234, 0.0]


def test_coslat_poly_close_to_cos():
    lats = np.linspace(-66.0, 66.0, 1000)
    err = np.abs(g.coslat_poly_np(lats) - np.cos(np.radians(lats)))
    assert err.max() < 2e-6


def test_poly_dist_close_to_true():
    d1 = g.equirect_dist_m_np(10.0, 44.0, 10.1, 44.1)
    d2 = g.equirect_dist_m_poly_np(10.0, 44.0, 10.1, 44.1)
    assert float(abs(d1 - d2)) < 0.1  # <10cm over ~14km


def test_polygon_area_unit_square_equator():
    # 1x1 deg square at the equator ~ (111319.5)^2 m^2 in GAIT's frame
    xs = np.array([0.0, 1.0, 1.0, 0.0])
    ys = np.array([-0.5, -0.5, 0.5, 0.5])
    area = g.polygon_area_m2_np(xs, ys)
    assert area == pytest.approx(111319.5**2 * math.cos(0.0), rel=1e-6)


def test_sentinel_z():
    z = np.array([g.MY_2D_SENTINEL_Z, 1.30700571, 0.0])
    assert list(g.is_sentinel_z_np(z)) == [True, False, False]
