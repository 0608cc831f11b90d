"""Hypothesis property layer over the projection inverses.

The per-projection fidelity tests pin two hand-picked parameter setups
each; these properties let hypothesis SEARCH the parameter space (random
central meridians, scale factors, standard parallels, origins, azimuths —
within each projection's valid domain) and shrink any counterexample.
Property: true-trig forward then polynomial inverse recovers lon/lat to
< 5e-8 deg (~5 mm).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

ang = st.floats(allow_nan=False, allow_infinity=False)


@settings(max_examples=300, deadline=None)
@given(
    lon0=st.floats(min_value=-177.0, max_value=177.0, allow_nan=False),
    k0=st.floats(min_value=0.99, max_value=1.001, allow_nan=False),
    fe=st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
    fn=st.floats(min_value=0.0, max_value=1e7, allow_nan=False),
    dlon=st.floats(min_value=-2.9, max_value=2.9, allow_nan=False),
    lat=st.floats(min_value=-80.0, max_value=84.0, allow_nan=False),
)
def test_tm_roundtrip_property(lon0, k0, fe, fn, dlon, lat):
    from geospatial_analysis_integrity_tool_spark.functions.utm import (
        geodetic_to_tm_np,
        tm_to_geodetic_np,
    )

    lon = np.array([lon0 + dlon])
    la = np.array([lat])
    e, n = geodetic_to_tm_np(lon, la, lon0, k0, fe, fn)
    lon2, lat2 = tm_to_geodetic_np(e, n, lon0, k0, fe, fn)
    assert abs(lon2[0] - lon[0]) < 5e-8
    assert abs(lat2[0] - la[0]) < 5e-8


@settings(max_examples=300, deadline=None)
@given(
    south=st.booleans(),
    lat=st.floats(min_value=64.0, max_value=89.99, allow_nan=False),
    lon=st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
)
def test_ups_roundtrip_property(south, lat, lon):
    from geospatial_analysis_integrity_tool_spark.functions.polar_stereo import (
        geodetic_to_ps_np,
        ps_to_geodetic_np,
    )

    la = np.array([-lat if south else lat])
    lo = np.array([lon])
    x, y = geodetic_to_ps_np(lo, la, south)
    lon2, lat2 = ps_to_geodetic_np(x, y, south)
    dlon = abs(((lon2[0] - lo[0] + 180.0) % 360.0) - 180.0)
    assert abs(lat2[0] - la[0]) < 5e-8
    assert dlon * np.cos(np.deg2rad(la[0])) < 5e-8


@settings(max_examples=300, deadline=None)
@given(
    lon0=st.floats(min_value=-177.0, max_value=177.0, allow_nan=False),
    k0=st.floats(min_value=0.99, max_value=1.0, allow_nan=False),
    dlon=st.floats(min_value=-150.0, max_value=150.0, allow_nan=False),
    lat=st.floats(min_value=-85.0, max_value=85.0, allow_nan=False),
)
def test_mercator_roundtrip_property(lon0, k0, dlon, lat):
    from geospatial_analysis_integrity_tool_spark.functions.mercator import (
        geodetic_to_mercator_np,
        mercator_to_geodetic_np,
    )

    lon = np.array([lon0 + dlon])
    la = np.array([lat])
    x, y = geodetic_to_mercator_np(lon, la, lon0, k0)
    lon2, lat2 = mercator_to_geodetic_np(x, y, lon0, k0)
    assert abs(lon2[0] - lon[0]) < 5e-8
    assert abs(lat2[0] - la[0]) < 5e-8


@settings(max_examples=300, deadline=None)
@given(
    lat1=st.floats(min_value=10.0, max_value=50.0, allow_nan=False),
    dpar=st.floats(min_value=3.0, max_value=25.0, allow_nan=False),
    lon0=st.floats(min_value=-170.0, max_value=170.0, allow_nan=False),
    dlat=st.floats(min_value=-12.0, max_value=25.0, allow_nan=False),
    dlon=st.floats(min_value=-25.0, max_value=25.0, allow_nan=False),
)
def test_lcc_roundtrip_property(lat1, dpar, lon0, dlat, dlon):
    from geospatial_analysis_integrity_tool_spark.functions.lcc import (
        geodetic_to_lcc_np,
        lcc_to_geodetic_np,
    )

    lat2p = lat1 + dpar
    lat0 = (lat1 + lat2p) / 2.0
    lon = np.array([lon0 + dlon])
    la = np.array([lat0 + dlat])
    x, y = geodetic_to_lcc_np(lon, la, lon0, lat1, lat2p, lat0)
    lon2, lat2 = lcc_to_geodetic_np(x, y, lon0, lat1, lat2p, lat0)
    assert abs(lon2[0] - lon[0]) < 5e-8
    assert abs(lat2[0] - la[0]) < 5e-8


@settings(max_examples=300, deadline=None)
@given(
    lat0=st.floats(min_value=-75.0, max_value=75.0, allow_nan=False),
    lon0=st.floats(min_value=-177.0, max_value=177.0, allow_nan=False),
    h0=st.floats(min_value=-100.0, max_value=5000.0, allow_nan=False),
    e=st.floats(min_value=-2e5, max_value=2e5, allow_nan=False),
    n=st.floats(min_value=-2e5, max_value=2e5, allow_nan=False),
    u=st.floats(min_value=-500.0, max_value=20000.0, allow_nan=False),
)
def test_ltp_roundtrip_property(lat0, lon0, h0, e, n, u):
    from geospatial_analysis_integrity_tool_spark.functions.ltp import (
        geodetic_to_ltp_np,
        ltp_to_geodetic_np,
    )

    lon1, lat1 = ltp_to_geodetic_np(
        np.array([e]), np.array([n]), np.array([u]), lat0, lon0, h0
    )
    e2, n2, u2 = geodetic_to_ltp_np(lon1, lat1, np.array([0.0]), lat0, lon0, h0)
    # round-trip in ENU meters: forward uses h=0, so only e/n compare —
    # project the residual onto the horizontal plane
    lon3, lat3 = ltp_to_geodetic_np(e2, n2, u2, lat0, lon0, h0)
    assert abs(lon3[0] - lon1[0]) < 5e-8
    assert abs(lat3[0] - lat1[0]) < 5e-8


@settings(max_examples=200, deadline=None)
@given(
    # near-zero center latitude / azimuth excluded up front (equatorial
    # aposphere degeneracy resp. the TM regime) — strategy-level, no assume
    latc=st.one_of(
        st.floats(min_value=1.5, max_value=60.0, allow_nan=False),
        st.floats(min_value=-60.0, max_value=-1.5, allow_nan=False),
    ),
    lonc=st.floats(min_value=-170.0, max_value=170.0, allow_nan=False),
    azc=st.one_of(
        st.floats(min_value=1.5, max_value=80.0, allow_nan=False),
        st.floats(min_value=-80.0, max_value=-1.5, allow_nan=False),
    ),
    k0=st.floats(min_value=0.99, max_value=1.0, allow_nan=False),
    dlat=st.floats(min_value=-8.0, max_value=8.0, allow_nan=False),
    dlon=st.floats(min_value=-10.0, max_value=10.0, allow_nan=False),
)
def test_om_roundtrip_property(latc, lonc, azc, k0, dlat, dlon):
    from geospatial_analysis_integrity_tool_spark.functions.om import (
        geodetic_to_om_np,
        om_to_geodetic_np,
    )

    lon = np.array([lonc + dlon])
    la = np.array([latc + dlat])
    u, v = geodetic_to_om_np(lon, la, latc, lonc, azc, k0)
    lon2, lat2 = om_to_geodetic_np(u, v, latc, lonc, azc, k0)
    assert abs(lon2[0] - lon[0]) < 5e-8
    assert abs(lat2[0] - la[0]) < 5e-8
