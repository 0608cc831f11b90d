"""Hypothesis property layer over the compiled-reference oracle.

The bulk numpy fuzz (test_ref_oracle_parity.py, ~650k cases) provides
volume; this module adds hypothesis's adversarial SEARCH — shrinking
counterexamples over structured strategies (quantized grids that force
exact collinearity, vertex sharing, degenerate spans) for the kernels with
the most intricate branch structure.  Every property asserts bit-for-bit
equality with the compiled C.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tools import ref_oracle
import geospatial_analysis_integrity_tool_spark.functions.gait_parity as gp

pytestmark = pytest.mark.skipif(
    not ref_oracle.available(),
    reason="reference sources or gcc not available",
)

# quantized coordinates: exact ties (equal endpoints, vertex-on-ray,
# collinear triples) occur with high probability
coord = st.integers(min_value=-200, max_value=200).map(lambda v: v * 10.0)
fine = st.floats(
    min_value=-2000.0, max_value=2000.0, allow_nan=False, allow_infinity=False
)
xy = st.one_of(coord, fine)


def _oracle():
    o = ref_oracle.get_oracle()
    o.xtranslation = 0.0
    o.ytranslation = 0.0
    o.set_euclidean(False)
    return o


@settings(max_examples=2000, deadline=None)
@given(
    px=xy, py=xy,
    verts=st.lists(st.tuples(xy, xy), min_size=3, max_size=10),
)
def test_point_inside_poly_property(px, py, verts):
    o = _oracle()
    xs = np.array([v[0] for v in verts])
    ys = np.array([v[1] for v in verts])
    ref = o.point_inside_poly(px, py, xs, ys)
    mine = gp.point_inside_poly_gait(
        np.array([px]), np.array([py]), xs[None, :], ys[None, :]
    )[0]
    assert mine == ref


@settings(max_examples=2000, deadline=None)
@given(
    a=st.tuples(xy, xy), b=st.tuples(xy, xy),
    c=st.tuples(xy, xy), d=st.tuples(xy, xy),
    tol=st.sampled_from([0.0001, 1.0, 25.0]),
)
def test_all_case_segments_property(a, b, c, d, tol):
    o = _oracle()
    rc, rx, ry = o.all_case_segments_intersect(
        a[0], a[1], b[0], b[1], c[0], c[1], d[0], d[1], tol
    )
    mc, mx, my = gp.all_case_segments_intersect_gait(
        np.array([a[0]]), np.array([a[1]]), np.array([b[0]]), np.array([b[1]]),
        np.array([c[0]]), np.array([c[1]]), np.array([d[0]]), np.array([d[1]]),
        tol,
    )
    assert mc[0] == rc
    if rc > 0:
        assert mx[0] == rx and my[0] == ry


@settings(max_examples=2000, deadline=None)
@given(
    p=st.tuples(xy, xy), s1=st.tuples(xy, xy), s2=st.tuples(xy, xy),
    slack=st.sampled_from([0.0001, 5.0]),
)
def test_point_on_line_segment_property(p, s1, s2, slack):
    o = _oracle()
    ref = o.point_on_line_segment(p[0], p[1], s1[0], s1[1], s2[0], s2[1], slack)
    mine = gp.point_on_line_segment_gait(
        np.array([p[0]]), np.array([p[1]]), np.array([s1[0]]),
        np.array([s1[1]]), np.array([s2[0]]), np.array([s2[1]]), slack
    )[0]
    assert mine == ref


@settings(max_examples=1500, deadline=None)
@given(
    x=st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    digits=st.sampled_from([0, 2, 3, 5]),
)
def test_truncate_property(x, digits):
    o = _oracle()
    assert gp.truncate_ndigits(np.array([x]), digits)[0] == o.truncate_ndigits(
        x, digits
    )
