"""Space-physics frame (GSE/GSM/SM/GM) fidelity tests.

The correctness gate proves Spark == DuckDB bit-for-bit; these prove the
shared formula is the RIGHT transform: Hapgood (1992) matrix properties,
the IGRF-13 dipole pole, and true-trig round-trip accuracy.
"""

from __future__ import annotations

import math

import numpy as np

from geospatial_analysis_integrity_tool_spark.functions import spaceframes as sf

FRAMES = ("GSE", "GSM", "SM", "GM")


def test_matrices_are_rotations():
    for f in FRAMES:
        m = np.array(sf.frame_to_geo_matrix(f))
        assert np.abs(m @ m.T - np.eye(3)).max() < 1e-12
        assert abs(np.linalg.det(m) - 1.0) < 1e-12


def test_igrf13_dipole_pole():
    # published geomagnetic (dipole) pole for IGRF-13 2020.0: ~80.6N, 72.7W
    mag = math.sqrt(sf.G10**2 + sf.G11**2 + sf.H11**2)
    q = (-sf.G11 / mag, -sf.H11 / mag, -sf.G10 / mag)
    lat = math.degrees(math.asin(q[2]))
    lon = math.degrees(math.atan2(q[1], q[0]))
    assert abs(lat - 80.59) < 0.2
    assert abs(lon - (-72.68)) < 0.2


def test_gm_axis_maps_to_dipole_pole():
    # the GM frame's +Z axis is the dipole axis: transform (0,0,R) -> GEO
    # must land at the geomagnetic pole
    lon, lat = sf.spaceframe_to_geodetic_np("GM", [0.0], [0.0], [6500e3])
    assert abs(lat[0] - 80.59) < 0.25  # geodetic vs geocentric ~0.03 deg here
    assert abs(lon[0] - (-72.68)) < 0.2


def test_gsm_z_equals_gse_z_rotation_only_about_x():
    # T3 rotates about X: GSE and GSM share the +X (sun-pointing) axis
    t1, t2, t3, t4, t5 = sf.hapgood_matrices(*sf.SPEC_EPOCH)
    gse = np.array(sf.frame_to_geo_matrix("GSE"))
    gsm = np.array(sf.frame_to_geo_matrix("GSM"))
    assert np.abs(gse[:, 0] - gsm[:, 0]).max() < 1e-12


def test_sm_z_is_dipole_axis():
    # SM's +Z axis is the dipole axis (Hapgood sec. 3.4)
    mag = math.sqrt(sf.G10**2 + sf.G11**2 + sf.H11**2)
    q = np.array([-sf.G11 / mag, -sf.H11 / mag, -sf.G10 / mag])
    m = np.array(sf.frame_to_geo_matrix("SM"))
    assert np.abs(m[:, 2] - q).max() < 1e-9


def test_roundtrip_accuracy_all_frames():
    rng = np.random.default_rng(19)
    lon = rng.uniform(-180.0, 180.0, 500)
    lat = rng.uniform(-89.5, 89.5, 500)
    h = rng.uniform(0.0, 500e3, 500)
    for f in FRAMES:
        x, y, z = sf.geodetic_to_spaceframe_np(f, lon, lat, h)
        lo2, la2 = sf.spaceframe_to_geodetic_np(f, x, y, z)
        assert np.max(np.abs(lo2 - lon)) < 1e-9
        assert np.max(np.abs(la2 - lat)) < 1e-9


def test_frames_are_distinct():
    # same frame coordinates land at different geodetic points per frame
    pts = ([5000e3], [3000e3], [2000e3])
    seen = set()
    for f in FRAMES:
        lo, la = sf.spaceframe_to_geodetic_np(f, *pts)
        seen.add((round(lo[0], 6), round(la[0], 6)))
    assert len(seen) == 4
