"""Reference-exact geometry kernels (bit-for-bit twins of the GAIT C code).

Each kernel here reproduces the reference's EXACT IEEE-754 operation order,
branch structure, and tie-breaks — not just the formula.  They are fuzzed
bit-for-bit against the *compiled* reference predicates (extracted from the C
sources and built into a .so by ``tools/ref_oracle.py``) in
``tests/test_ref_oracle_parity.py``; that test is the row-for-row parity
evidence that no SQL-twin oracle can give.

Reference functions mirrored (file:line into ``GAIT 26 Source/``):

* ``truncate_ndigits``            — TruncateToNdigits, utilities.c:97
  (sprintf ``%33.13lf`` rounds to 13 decimals, then the string is CUT at
  ``digits`` decimals — NOT a plain multiply/trunc; -0.0099999999999995 at
  3 digits is -0.01, not -0.009).
* ``distance_gait``               — Distance, TT.c:7151 (geodetic branch:
  GAIT coords /1e5 + translation, cos at average latitude, meters).
* ``euclidean_distance_gait``     — EuclideanDistance, TT.c:7128.
* ``two_decimal_distance_gait``   — TwoDecimalDistance, TT.c:7202.
* ``equal_within_tolerance_gait`` — EqualWithinTolerance, TT.c:6480
  (x-window with ``tolerance``, y-window with the HARD-CODED 0.1, then a
  true Distance compare).
* ``line_equation_gait``          — LineEquation, TT.c:1980.
* ``point_to_line_dist2d_gait``   — PointToLineDist2D, TT.c:7265.
* ``point_on_line_segment_gait``  — PointOnLineSegment, TT.c:8247 (returns
  2/3 on exact endpoint equality, 1 when within slack of the carrier line
  inside the slack-expanded bbox).
* ``triangle_xy_surface_area_gait`` — TriangleXYsurfaceArea, TT.c:6783.
* ``point_inside_poly_gait``      — PointInsidePoly, TT.c:6920 (eastward ray
  with strict inequalities plus the explicit vertex-on-ray branch that scans
  back over a collinear run; counts iff the run's flanking vertices straddle
  the ray).
* ``two_points_same_side_gait``   — TwoPointsOnSameSideOfLine,
  moregeomchecks.c:5241 (note: compares against ``lx2,ly2`` for the second
  point — the reference's own asymmetry, kept verbatim).
* ``all_case_segments_intersect_gait`` — AllCaseLineSegmentsIntersect,
  moregeomchecks.c:5319 (tolerance endpoint-snap priority chain, collinear-
  overlap returns 0, parallel cutoff ``|det| < 1e-5`` ABSOLUTE, return codes
  0-9 + intersection point).
* ``point_on_quarter_degree_boundary_gait`` — PointOnQuarterDegreeBoundary,
  TT.c:1400 (nearest 1/4-degree graticule via int truncation, distance
  compare in the meters frame).

All kernels are numpy over whole batches (no per-row Python), so they drop
into the engine's Arrow-batched UDF stages unchanged.  GAIT's native frame is
``gait = (degrees - translation) * 100000`` (YCoordToProjectCoord,
TT.c:2000); pass the same translations the reference run would use.
"""

from __future__ import annotations

import numpy as np

PI = 3.141592653589793  # PIvalue, TTshare.h:14
WGS84_DEGREE_LENGTH_M = 111319.5  # GAIT_API.h:31


# ---------------------------------------------------------------------------
# scalar-ish helpers (vectorized elementwise)
# ---------------------------------------------------------------------------

def truncate_ndigits(v, digits: int = 3) -> np.ndarray:
    """sprintf-based truncation (utilities.c:97): round to 13 decimals by
    correctly-rounded decimal formatting, then cut the string at ``digits``
    decimals.  Python's ``%f`` and glibc's printf both produce the correctly
    rounded decimal expansion, so this is bit-identical to the C."""
    v = np.atleast_1d(np.asarray(v, dtype=np.float64))
    out = np.empty_like(v)
    flat = v.ravel()
    o = out.ravel()
    cut = 20 + digits
    for i in range(flat.size):  # string formatting is inherently per-element;
        # only used on bounded report columns / in parity tests, never in a
        # wide hot path (the oracle-gated paths use sql_trunc3_mm).
        s = "%33.13f" % flat[i]
        o[i] = float(s[:cut])
    return out


def euclidean_distance_gait(x1, y1, x2, y2) -> np.ndarray:
    """EuclideanDistance, TT.c:7128 — note the += association order."""
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    answer = (x1 - x2) * (x1 - x2)
    answer = answer + (y1 - y2) * (y1 - y2)
    return np.sqrt(answer)


def distance_gait(x1, y1, x2, y2, xt: float = 0.0, yt: float = 0.0,
                  euclidean: bool = False) -> np.ndarray:
    """Distance, TT.c:7151 (geodetic branch), in GAIT native coords."""
    if euclidean:
        return euclidean_distance_gait(x1, y1, x2, y2)
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    tx1 = x1 / 100000.0 + xt
    tx2 = x2 / 100000.0 + xt
    ty1 = y1 / 100000.0 + yt
    ty2 = y2 / 100000.0 + yt
    avglatitude = (ty2 - ty1) / 2.0 + ty1
    avglatitude = (avglatitude * PI) / 180.0
    temp = WGS84_DEGREE_LENGTH_M * np.cos(avglatitude)
    temp = (tx2 - tx1) * temp
    answer = temp * temp
    temp = WGS84_DEGREE_LENGTH_M * (ty2 - ty1)
    answer = answer + temp * temp
    answer = np.where(answer < 0, 0.0, answer)
    return np.where(answer < 0, answer, np.sqrt(np.maximum(answer, 0.0)))


def two_decimal_distance_gait(x1, y1, x2, y2, xt: float = 0.0, yt: float = 0.0,
                              euclidean: bool = False) -> np.ndarray:
    return truncate_ndigits(
        distance_gait(x1, y1, x2, y2, xt, yt, euclidean), 2
    )


def equal_within_tolerance_gait(x1, y1, x2, y2, tolerance, xt: float = 0.0,
                                yt: float = 0.0,
                                euclidean: bool = False) -> np.ndarray:
    """EqualWithinTolerance, TT.c:6480.  Returns int 0/1."""
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    tolerance = np.asarray(tolerance, dtype=np.float64)
    xwin = ((x1 + tolerance) > x2) & ((x1 - tolerance) < x2)
    ywin = ((y1 + 0.1) > y2) & ((y1 - 0.1) < y2)
    with np.errstate(invalid="ignore"):
        dist = distance_gait(x1, y1, x2, y2, xt, yt, euclidean)
    return (xwin & ywin & (dist <= tolerance)).astype(np.int32)


def line_equation_gait(x1, y1, x2, y2):
    """LineEquation, TT.c:1980 — returns (A, B, C) arrays."""
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    X = x1 - x2
    Y = y1 - y2
    RSG = (X * X) + (Y * Y)
    with np.errstate(divide="ignore", invalid="ignore"):
        RINV = 1.0 / np.sqrt(RSG)
        A = np.where(y1 == y2, 0.0, -1.0 * Y * RINV)
        B = np.where(x1 == x2, 0.0, X * RINV)
    C = 0.0 - (A * x1) - (B * y1)
    return A, B, C


def point_to_line_dist2d_gait(xj, yj, xk, yk, xl, yl, xt: float = 0.0,
                              yt: float = 0.0,
                              euclidean: bool = False) -> np.ndarray:
    """PointToLineDist2D, TT.c:7265 — distance to the INFINITE-line foot when
    the projection parameter t lands in (0,1), else to the nearer endpoint;
    degenerate segment (point) measured point-to-point."""
    xj = np.asarray(xj, dtype=np.float64)
    yj = np.asarray(yj, dtype=np.float64)
    xk = np.asarray(xk, dtype=np.float64)
    yk = np.asarray(yk, dtype=np.float64)
    xl = np.asarray(xl, dtype=np.float64)
    yl = np.asarray(yl, dtype=np.float64)
    xkj = xk - xj
    xlk = xl - xk
    ykj = yk - yj
    ylk = yl - yk
    degenerate = (xk == xl) & (yk == yl)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = 0.0 - ((xkj * xlk) + (ykj * ylk))
        t2den = (xlk * xlk) + (ylk * ylk)
        t = t / t2den
        A, B, C = line_equation_gait(xk, yk, xl, yl)
        An = B
        Bn = 0.0 - A
        Cn = (A * yj) - (B * xj)
        t3 = (A * Bn) - (An * B)
        t3 = 1.0 / t3
        xi = ((B * Cn) - (Bn * C)) * t3
        yi = ((An * C) - (A * Cn)) * t3
        d_foot = distance_gait(xj, yj, xi, yi, xt, yt, euclidean)
        d_k = distance_gait(xj, yj, xk, yk, xt, yt, euclidean)
        d_l = distance_gait(xj, yj, xl, yl, xt, yt, euclidean)
    mid = np.where(t <= 0, d_k, np.where(t >= 1, d_l, d_foot))
    return np.where(degenerate, d_k, mid)


def point_on_line_segment_gait(px, py, x1, y1, x2, y2, slack, xt: float = 0.0,
                               yt: float = 0.0,
                               euclidean: bool = False) -> np.ndarray:
    """PointOnLineSegment, TT.c:8247 — returns int 0/1/2/3."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    slack = np.asarray(slack, dtype=np.float64)
    at1 = (px == x1) & (py == y1)
    at2 = (px == x2) & (py == y2) & ~at1
    minx = np.where(x1 < x2, x1 - slack, x2 - slack)
    maxx = np.where(x1 < x2, x2 + slack, x1 + slack)
    miny = np.where(y1 < y2, y1 - slack, y2 - slack)
    maxy = np.where(y1 < y2, y2 + slack, y1 + slack)
    inbox = (minx <= px) & (px <= maxx) & (miny <= py) & (py <= maxy)
    with np.errstate(divide="ignore", invalid="ignore"):
        temp = point_to_line_dist2d_gait(px, py, x1, y1, x2, y2, xt, yt,
                                         euclidean)
    near = inbox & ((temp < slack) | (temp == 0.0))
    out = np.where(at1, 2, np.where(at2, 3, np.where(near, 1, 0)))
    return out.astype(np.int32)


def triangle_xy_surface_area_gait(x0, y0, x1, y1, x2, y2) -> np.ndarray:
    """TriangleXYsurfaceArea, TT.c:6783."""
    x0 = np.asarray(x0, dtype=np.float64)
    y0 = np.asarray(y0, dtype=np.float64)
    x10 = np.asarray(x1, dtype=np.float64) - x0
    x20 = np.asarray(x2, dtype=np.float64) - x0
    y10 = np.asarray(y1, dtype=np.float64) - y0
    y20 = np.asarray(y2, dtype=np.float64) - y0
    answer = (x10 * y20) - (x20 * y10)
    answer = answer * 0.5
    return np.where(answer < 0, 0.0 - answer, answer)


def two_points_same_side_gait(px1, py1, px2, py2, lx1, ly1, lx2, ly2) -> np.ndarray:
    """TwoPointsOnSameSideOfLine, moregeomchecks.c:5241.  The second point's
    offset is taken from (lx2, ly2) — the reference's own asymmetry, kept."""
    px1 = np.asarray(px1, dtype=np.float64)
    py1 = np.asarray(py1, dtype=np.float64)
    px2 = np.asarray(px2, dtype=np.float64)
    py2 = np.asarray(py2, dtype=np.float64)
    lx1 = np.asarray(lx1, dtype=np.float64)
    ly1 = np.asarray(ly1, dtype=np.float64)
    lx2 = np.asarray(lx2, dtype=np.float64)
    ly2 = np.asarray(ly2, dtype=np.float64)
    dx = lx2 - lx1
    dy = ly2 - ly1
    dx1 = px1 - lx1
    dy1 = py1 - ly1
    dx2 = px2 - lx2
    dy2 = py2 - ly2
    temp = ((dx * dy1) - (dy * dx1)) * ((dx * dy2) - (dy * dx2))
    return (temp > 0).astype(np.int32)


# ---------------------------------------------------------------------------
# PointInsidePoly — TT.c:6920
# ---------------------------------------------------------------------------

def point_inside_poly_gait(px, py, X, Y, V=None) -> np.ndarray:
    """PointInsidePoly, TT.c:6920-6977, vectorized over (rows x padded verts).

    px, py: (n,) test points.  X, Y: (n, m) padded vertex matrices; V: (n, m)
    validity mask (default: all valid).  Rings are used EXACTLY as passed —
    no closing-vertex drop — matching the C, which indexes j=(i+1)%numb.

    Returns (n,) int32 0/1 (crossing parity).
    """
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    n, m = X.shape
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    if V is None:
        V = np.ones((n, m), dtype=bool)
    lens = V.sum(axis=1)
    idx = np.broadcast_to(np.arange(m)[None, :], (n, m))
    rows = np.arange(n)[:, None]
    nxt = np.where(idx + 1 >= lens[:, None], 0, idx + 1)  # j = (i+1) % numb
    Xi, Yi = X, Y
    Xj = X[rows, nxt]
    Yj = Y[rows, nxt]

    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        # branch 1: (y[i] < py < y[j])
        b1 = (Yi < py) & (py < Yj) & ((Xi > px) | (Xj > px))
        ny1 = (Yj - py) / (Yj - Yi)
        nx1 = Xj - ((Xj - Xi) * ny1)
        c1 = b1 & (nx1 > px)
        # branch 2: (y[j] < py < y[i])
        b2 = ~b1 & (Yj < py) & (py < Yi) & ((Xi > px) | (Xj > px))
        ny2 = (Yi - py) / (Yi - Yj)
        nx2 = Xi - ((Xi - Xj) * ny2)
        c2 = b2 & (nx2 > px)
        # branch 3: vertex-on-ray  (py == y[i]) && (px < x[i]) && (py != y[j])
        b3 = ~b1 & ~b2 & (py == Yi) & (px < Xi) & (py != Yj)
        xwin = (
            ((Xj <= px) & (Xi > px))
            | ((Xj >= px) & (Xi < px))
            | ((Xj >= px) & (Xi > px))
        )
        # scan back over the collinear run: k = nearest previous index
        # (cyclic, strictly before i) with y[k] != py
        noneq = (Y != py) & V
        cand = np.where(noneq, idx, -1)
        # last non-eq at-or-before position i
        prefix = np.maximum.accumulate(cand, axis=1)
        # strictly before i:
        before = np.concatenate(
            [np.full((n, 1), -1, dtype=np.int64), prefix[:, :-1]], axis=1
        )
        last_any = prefix[rows.ravel(), np.maximum(lens - 1, 0)][:, None]
        k = np.where(before >= 0, before, last_any)
        has_k = k >= 0
        k_safe = np.where(has_k, k, 0)
        Yk = Y[rows, k_safe]
        straddle = ((Yk < py) & (py < Yj)) | ((Yj < py) & (py < Yk))
        c3 = b3 & xwin & has_k & straddle

    crossing = (c1 | c2 | c3) & V
    return (crossing.sum(axis=1) % 2).astype(np.int32)


MY2DSENTINEL = 1.3070057  # GAIT_API.h:32
SENTINEL_SMIDGE = 0.0000001  # GAIT_API.h:33
ONE_RADIAN_IN_DEGREES = 57.29578  # TTshare.h:15 — GAIT's TRUNCATED constant,
# deliberately not 57.29577951...; row parity requires reproducing it


def radians_to_degrees_gait(v) -> np.ndarray:
    """RadiansToDegrees, TT.c:6880 — multiply by the truncated constant,
    then truncate to 5 decimals through a (long int) cast."""
    v = np.asarray(v, dtype=np.float64)
    deg = v * ONE_RADIAN_IN_DEGREES
    dii = (deg * 100000.0).astype(np.int64)  # C (long int) truncates toward 0
    return dii.astype(np.float64) / 100000.0


def angle_between_line_segments_gait(lx1, ly1, lx2, ly2, x1, y1, x2, y2) -> np.ndarray:
    """AngleBetweenLineSegments, TT.c:6895 — cos of the angle between the
    two carrier lines via normalized LineEquation coefficients."""
    A1, B1, _ = line_equation_gait(lx1, ly1, lx2, ly2)
    A2, B2, _ = line_equation_gait(x1, y1, x2, y2)
    d1 = (A1 * A2) + (B1 * B2)
    d2 = (A1 * A1) + (B1 * B1)
    d3 = (A2 * A2) + (B2 * B2)
    d2 = d2 * d3
    d2 = np.sqrt(d2)
    with np.errstate(divide="ignore", invalid="ignore"):
        return d1 / d2


def tempis2d_gait(v) -> np.ndarray:
    """tempis2D, SEEIT_API.c:2840 — sentinel-z window compare."""
    v = np.asarray(v, dtype=np.float64)
    return (
        ~(v > (MY2DSENTINEL + SENTINEL_SMIDGE))
        & ~(v < (MY2DSENTINEL - SENTINEL_SMIDGE))
    ).astype(np.int32)


def is_sentinel_z_gait(v, count_nunanpo: int = 0, tds_mode: bool = False) -> np.ndarray:
    """IsSentinelZvalue, TT.c:1589 — 2-D sentinel, -50000 no-elevation,
    and (non-TDS schemas, when NUNANPO allowed) the integer-valued
    -32768..-32764 NUNANPO sentinels."""
    v = np.asarray(v, dtype=np.float64)
    is2d = tempis2d_gait(v).astype(bool)
    ans = np.zeros(v.shape, dtype=bool)
    if tds_mode:
        ans = v == -50000.0
    else:
        if count_nunanpo > 0:
            in_win = (-32768 <= v) & (v <= -32764)
            ti = v.astype(np.int64)
            ans = in_win & (ti.astype(np.float64) == v)
        ans = ans | (v == -50000.0)
    return (ans | is2d).astype(np.int32)


def distance3d_gait(x1, y1, z1, x2, y2, z2, xt: float = 0.0, yt: float = 0.0,
                    euclidean: bool = False, count_nunanpo: int = 0,
                    tds_mode: bool = False) -> np.ndarray:
    """Distance3D, TT.c:7211 — planar distance when either z is a sentinel,
    else the 2-D-sentinel-guarded 3-D hypotenuse."""
    d2 = distance_gait(x1, y1, x2, y2, xt, yt, euclidean)
    z1 = np.asarray(z1, dtype=np.float64)
    z2 = np.asarray(z2, dtype=np.float64)
    s1 = is_sentinel_z_gait(z1, count_nunanpo, tds_mode).astype(bool)
    s2 = is_sentinel_z_gait(z2, count_nunanpo, tds_mode).astype(bool)
    both3d = (tempis2d_gait(z1) == 0) & (tempis2d_gait(z2) == 0)
    sq = d2 * d2
    sq3 = np.where(both3d, sq + (z1 - z2) * (z1 - z2), sq)
    return np.where(s1 | s2, d2, np.sqrt(sq3))


def point_to_full_line_dist2d_gait(px, py, lx1, ly1, lx2, ly2) -> np.ndarray:
    """PointToFullLineDist2D, TT.c:8996 — |Ax+By+C| / sqrt(A^2+B^2)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    A, B, C = line_equation_gait(lx1, ly1, lx2, ly2)
    temp = A * px
    temp = temp + B * py
    temp = temp + C
    temp = np.where(temp < 0, 0.0 - temp, temp)
    temp2 = np.sqrt((A * A) + (B * B))
    return temp / temp2


def point_inside_triangle_gait(x, y, x1, y1, x2, y2, x3, y3) -> np.ndarray:
    """PointInsideTriangle, TT.c:6981 — consistent-side-sign test, but
    DEGENERATE (area < 0.1) triangles fall back to PointInsidePoly."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    x3 = np.asarray(x3, dtype=np.float64)
    y3 = np.asarray(y3, dtype=np.float64)
    area = triangle_xy_surface_area_gait(x1, y1, x2, y2, x3, y3)
    c1 = ((x - x1) * (y2 - y1)) - ((x2 - x1) * (y - y1))
    c2 = ((x - x2) * (y3 - y2)) - ((x3 - x2) * (y - y2))
    c3 = ((x - x3) * (y1 - y3)) - ((x1 - x3) * (y - y3))
    signs = ((c1 <= 0) & (c2 <= 0) & (c3 <= 0)) | (
        (c1 >= 0) & (c2 >= 0) & (c3 >= 0)
    )
    out = signs.astype(np.int32)
    small = area < 0.1
    if np.any(small):
        idx = np.where(np.broadcast_to(small, out.shape))[0]
        X = np.stack(
            [
                np.broadcast_to(x1, out.shape)[idx],
                np.broadcast_to(x2, out.shape)[idx],
                np.broadcast_to(x3, out.shape)[idx],
            ],
            axis=1,
        )
        Y = np.stack(
            [
                np.broadcast_to(y1, out.shape)[idx],
                np.broadcast_to(y2, out.shape)[idx],
                np.broadcast_to(y3, out.shape)[idx],
            ],
            axis=1,
        )
        out[idx] = point_inside_poly_gait(
            np.broadcast_to(x, out.shape)[idx],
            np.broadcast_to(y, out.shape)[idx],
            X,
            Y,
        )
    return out


def line_segments_intersect_gait(xl, yl, xk, yk, xm, ym, xn, yn):
    """LineSegmentsIntersect, TT.c:8933 — shared-endpoint early returns
    (intersection = the shared vertex), absolute |det| < 1e-5 parallel
    cutoff, parametric crossing point.  Returns (code, xi, yi)."""
    xl = np.asarray(xl, dtype=np.float64)
    yl = np.asarray(yl, dtype=np.float64)
    xk = np.asarray(xk, dtype=np.float64)
    yk = np.asarray(yk, dtype=np.float64)
    xm = np.asarray(xm, dtype=np.float64)
    ym = np.asarray(ym, dtype=np.float64)
    xn = np.asarray(xn, dtype=np.float64)
    yn = np.asarray(yn, dtype=np.float64)
    shp = np.broadcast(xl, xm).shape
    code = np.zeros(shp, dtype=np.int32)
    xi = np.full(shp, np.nan)
    yi = np.full(shp, np.nan)
    # shared-endpoint chain (first match wins)
    chain = [
        ((xl == xm) & (yl == ym), xm, ym),
        ((xk == xm) & (yk == ym), xm, ym),
        ((xl == xn) & (yl == yn), xn, yn),
        ((xk == xn) & (yk == yn), xn, yn),
    ]
    assigned = np.zeros(shp, dtype=bool)
    for mask, mx, my in chain:
        sel = mask & ~assigned
        code[sel] = 1
        xi[sel] = np.broadcast_to(mx, shp)[sel]
        yi[sel] = np.broadcast_to(my, shp)[sel]
        assigned |= sel
    xlk = xl - xk
    ylk = yl - yk
    xnm = xn - xm
    ynm = yn - ym
    xmk = xm - xk
    ymk = ym - yk
    det = (xnm * ylk) - (ynm * xlk)
    parallel = (-0.00001 < det) & (det < 0.00001)
    with np.errstate(divide="ignore", invalid="ignore"):
        detinv = 1.0 / det
        s = ((xnm * ymk) - (ynm * xmk)) * detinv
        t = (xlk * ymk - ylk * xmk) * detinv
        cross = (
            ~assigned & ~parallel
            & (s >= 0.0) & (s <= 1.0) & (t >= 0.0) & (t <= 1.0)
        )
        code[cross] = 1
        xi[cross] = (xk + xlk * s)[cross]
        yi[cross] = (yk + ylk * s)[cross]
    return code, xi, yi


def point_inside_poly_gait_ring(px, py, ring_x, ring_y) -> np.ndarray:
    """Many points against ONE ring — reference-exact twin of
    geometry.pip_ray_cast_ring (drops an explicitly repeated closing vertex
    first, as the engine's ring convention does; the C indexes (i+1)%numb
    so an unclosed ring is what it expects)."""
    rx = np.asarray(ring_x, dtype=np.float64)
    ry = np.asarray(ring_y, dtype=np.float64)
    if len(rx) >= 2 and rx[-1] == rx[0] and ry[-1] == ry[0]:
        rx, ry = rx[:-1], ry[:-1]
    px = np.asarray(px, dtype=np.float64)
    n = len(px)
    m = len(rx)
    if m == 0:
        return np.zeros(n, dtype=np.int32)
    X = np.broadcast_to(rx[None, :], (n, m))
    Y = np.broadcast_to(ry[None, :], (n, m))
    return point_inside_poly_gait(px, py, X, Y)


# ---------------------------------------------------------------------------
# AllCaseLineSegmentsIntersect — moregeomchecks.c:5319
# ---------------------------------------------------------------------------

def all_case_segments_intersect_gait(
    x1, y1, x2, y2, x3, y3, x4, y4, tolerance, xt: float = 0.0,
    yt: float = 0.0, euclidean: bool = False,
):
    """AllCaseLineSegmentsIntersect, moregeomchecks.c:5319, vectorized.

    Returns (code, xi, yi) arrays.  code 0 = no intersection (including
    collinear overlap), 1 = proper crossing (xi/yi = crossing point),
    2-5 = endpoints equal within tolerance (1&3, 1&4, 2&3, 2&4),
    6-9 = an endpoint lies on the other segment (1,2,3,4).  xi/yi are NaN
    where code == 0 (the C leaves them unset there).
    """
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    x3 = np.asarray(x3, dtype=np.float64)
    y3 = np.asarray(y3, dtype=np.float64)
    x4 = np.asarray(x4, dtype=np.float64)
    y4 = np.asarray(y4, dtype=np.float64)

    ewt = lambda ax, ay, bx, by: equal_within_tolerance_gait(
        ax, ay, bx, by, tolerance, xt, yt, euclidean
    ).astype(bool)
    pols = lambda pxx, pyy, ax, ay, bx, by: (
        point_on_line_segment_gait(pxx, pyy, ax, ay, bx, by, tolerance,
                                   xt, yt, euclidean) > 0
    )

    con13 = ewt(x1, y1, x3, y3)
    con14 = ~con13 & ewt(x1, y1, x4, y4)
    con23 = ~con13 & ~con14 & ewt(x2, y2, x3, y3)
    con24 = ~con13 & ~con14 & ~con23 & ewt(x2, y2, x4, y4)

    on1 = pols(x1, y1, x3, y3, x4, y4)
    on2 = pols(x2, y2, x3, y3, x4, y4)
    on3 = pols(x3, y3, x1, y1, x2, y2)
    on4 = pols(x4, y4, x1, y1, x2, y2)

    early0 = (
        (on1 & on2)
        | (on3 & on1 & ~con13)
        | (on3 & on2 & ~con23)
        | (on4 & on1 & ~con14)
        | (on4 & on2 & ~con24)
    )

    # parametric branch (evaluated everywhere, selected where needed)
    x12 = x1 - x2
    y12 = y1 - y2
    x43 = x4 - x3
    y43 = y4 - y3
    x32 = x3 - x2
    y32 = y3 - y2
    det = (x43 * y12) - (y43 * x12)
    parallel = (-0.00001 < det) & (det < 0.00001)
    with np.errstate(divide="ignore", invalid="ignore"):
        detinv = 1.0 / det
        s = ((x43 * y32) - (y43 * x32)) * detinv
        t = (x12 * y32 - y12 * x32) * detinv
        cross = ~parallel & (s >= 0.0) & (s <= 1.0) & (t >= 0.0) & (t <= 1.0)
        xi_c = x2 + x12 * s
        yi_c = y2 + y12 * s

    n = x1.shape if x1.ndim else (1,)
    code = np.zeros(np.broadcast(x1, x3).shape, dtype=np.int32)
    xi = np.full_like(code, np.nan, dtype=np.float64)
    yi = np.full_like(code, np.nan, dtype=np.float64)

    # priority chain (first match wins), then early-return-0 overrides
    chain = [
        (con13, 2, x1, y1),
        (con14, 3, x1, y1),
        (con23, 4, x2, y2),
        (con24, 5, x2, y2),
        (on1, 6, x1, y1),
        (on2, 7, x2, y2),
        (on3, 8, x3, y3),
        (on4, 9, x4, y4),
        (cross, 1, xi_c, yi_c),
    ]
    assigned = np.zeros_like(code, dtype=bool)
    for mask, c, mx, my in chain:
        sel = mask & ~assigned
        code[sel] = c
        xi[sel] = np.broadcast_to(mx, code.shape)[sel]
        yi[sel] = np.broadcast_to(my, code.shape)[sel]
        assigned |= sel
    code[early0] = 0
    xi[early0] = np.nan
    yi[early0] = np.nan
    return code, xi, yi


# ---------------------------------------------------------------------------
# CalculateGeodeticCoordArea — TT.c:4200
# ---------------------------------------------------------------------------

def calculate_geodetic_coord_area_gait(
    xs, ys, minx, miny, startindex, stopindex,
    xt: float = 0.0, yt: float = 0.0,
    min_native_x: float = 0.0, min_native_y: float = 0.0,
):
    """CalculateGeodeticCoordArea, TT.c:4200-4360 — the areal measurement
    kernel behind SMALLAREA/SLIVER/PERIMLEN.  Exact transcription:

    * exactly-3-vertex spans short-circuit to TriangleXYsurfaceArea on RAW
      GAIT coords (plus a Distance-based perimeter over the span);
    * otherwise every vertex converts to a local meters frame whose scale
      is the cos at the average of ITS latitude and MinNativeY (per-vertex
      scale, not one polygon-mean scale), offset by the (minx, miny) base
      conversion, and the area accumulates the reference's own trapezoid
      form ``(Xold - x[i]) * (Yold + y[i] - miny)`` — including its use of
      the RAW miny parameter against converted coordinates, kept verbatim
      for row parity;
    * wrap-around spans (startindex > stopindex) walk through numverts.

    Scalar (per ring); returns (area_m2, perimeter_m).
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    numverts = len(xs)

    if startindex + 3 == stopindex:
        perim = 0.0
        tx = np.empty(3)
        ty = np.empty(3)
        for i in range(startindex, stopindex):
            tx[i - startindex] = xs[i]
            ty[i - startindex] = ys[i]
            if i > startindex:
                perim += float(
                    distance_gait(xs[i - 1], ys[i - 1], xs[i], ys[i], xt, yt)
                )
            else:
                perim = float(
                    distance_gait(
                        xs[i], ys[i], xs[stopindex - 1], ys[stopindex - 1],
                        xt, yt,
                    )
                )
        area = float(
            triangle_xy_surface_area_gait(
                tx[0], ty[0], tx[1], ty[1], tx[2], ty[2]
            )
        )
        return area, perim

    tx1 = min_native_x
    ty1 = min_native_y
    tx2 = minx / 100000.0 + xt
    ty2 = miny / 100000.0 + yt
    avglat = (ty2 - ty1) / 2.0 + ty1
    avglat = (avglat * PI) / 180.0
    temp = WGS84_DEGREE_LENGTH_M * np.cos(avglat)
    xbase = (tx2 - tx1) * temp
    if xbase < 0:
        xbase = 0 - xbase
    ybase = WGS84_DEGREE_LENGTH_M * (ty2 - ty1)
    if ybase < 0:
        ybase = 0 - ybase

    # per-vertex conversion (vectorized, same op order per element)
    tx2v = xs / 100000.0 + xt
    ty2v = ys / 100000.0 + yt
    avglatv = (ty2v - ty1) / 2.0 + ty1
    avglatv = (avglatv * PI) / 180.0
    tempv = WGS84_DEGREE_LENGTH_M * np.cos(avglatv)
    cx = (tx2v - tx1) * tempv - xbase
    cy = WGS84_DEGREE_LENGTH_M * (ty2v - ty1) - ybase

    perim = 0.0
    area = 0.0
    if stopindex == 0:
        xold = cx[numverts - 1]
        yold = cy[numverts - 1]
    else:
        xold = cx[stopindex - 1]
        yold = cy[stopindex - 1]

    def _legs(i):
        nonlocal perim
        if i > startindex:
            perim += float(
                distance_gait(xs[i - 1], ys[i - 1], xs[i], ys[i], xt, yt)
            )
        else:
            perim = float(
                distance_gait(
                    xs[i], ys[i], xs[stopindex - 1], ys[stopindex - 1], xt, yt
                )
            )

    if startindex < stopindex:
        for i in range(startindex, stopindex):
            _legs(i)
            area += (xold - cx[i]) * (yold + cy[i] - miny)
            xold = cx[i]
            yold = cy[i]
    else:
        i = startindex
        while i != stopindex:
            _legs(i)
            area += (xold - cx[i]) * (yold + cy[i] - miny)
            xold = cx[i]
            yold = cy[i]
            i += 1
            if i == stopindex:
                break
            elif i == numverts:
                i = 0

    if area < 0:
        area = 0.0 - area
    area = 0.5 * area
    return area, perim


# ---------------------------------------------------------------------------
# PointOnQuarterDegreeBoundary — TT.c:1400
# ---------------------------------------------------------------------------

def point_on_quarter_degree_boundary_gait(px, py, tolerance, xt: float = 0.0,
                                          yt: float = 0.0) -> np.ndarray:
    """PointOnQuarterDegreeBoundary, TT.c:1400 (geodetic branch)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)

    def _axis(coord, trans):
        temp = coord / 100000.0 + trans
        temp1 = np.where(temp >= 0, temp + 0.125, temp - 0.125)
        temp1 = temp1 / 0.25
        truncated = temp1.astype(np.int64)  # C (int) cast truncates toward 0
        temp2 = truncated.astype(np.float64) * 0.25
        temp1 = (temp2 - trans) * 100000.0
        return np.where(temp1 > coord, temp1 - coord, coord - temp1)

    dy = _axis(py, yt)
    dist_y = distance_gait(px, py, px, py + dy, xt, yt)
    hit_y = dist_y <= tolerance
    dx = _axis(px, xt)
    dist_x = distance_gait(px, py, px + dx, py, xt, yt)
    hit_x = dist_x <= tolerance
    return (hit_y | hit_x).astype(np.int32)


def strictly_between_gait(x, y, x1, y1, x2, y2) -> int:
    """StrictlyBetween (TT.c:9484): per-axis open betweenness with the
    degenerate-equal fallbacks, exact branch order."""
    answer = 0
    if x1 <= x2 and x1 < x < x2:
        answer = 1
    elif x2 <= x1 and x2 < x < x1:
        answer = 1
    elif x1 == x2 and x1 == x:
        answer = 1
    if answer == 1:
        answer = 0
        if y1 <= y2 and y1 < y < y2:
            answer = 1
        elif y2 <= y1 and y2 < y < y1:
            answer = 1
        elif y2 == y1 and y2 == y:
            answer = 1
    return answer


def between_gait(x, y, x1, y1, x2, y2) -> int:
    """Between (TT.c:9508): closed-interval per-axis betweenness."""
    answer = 0
    if x1 <= x2 and x1 <= x <= x2:
        answer = 1
    elif x2 <= x1 and x2 <= x <= x1:
        answer = 1
    if answer == 1:
        answer = 0
        if y1 <= y2 and y1 <= y <= y2:
            answer = 1
        elif y2 <= y1 and y2 <= y <= y1:
            answer = 1
    return answer


def point_to_line_dist3d_gait(xp, yp, zp, xl1, yl1, zl1, xl2, yl2, zl2) -> float:
    """PointToLineDist (TT.c:7358): clamped 3D point-to-segment distance
    (degenerate segment -> endpoint distance via t = -1)."""
    if xl1 == xl2 and yl1 == yl2 and zl1 == zl2:
        t = -1.0
        f = g = h = 0.0
    else:
        f = xl2 - xl1
        g = yl2 - yl1
        h = zl2 - zl1
        v1 = f * f + g * g + h * h
        t = f * (xp - xl1) + g * (yp - yl1) + h * (zp - zl1)
        t = t / v1
    if t <= 0:
        return float(distance3d_gait(xp, yp, zp, xl1, yl1, zl1))
    if t >= 1:
        return float(distance3d_gait(xp, yp, zp, xl2, yl2, zl2))
    xn = xl1 + f * t
    yn = yl1 + g * t
    zn = zl1 + h * t
    return float(distance3d_gait(xp, yp, zp, xn, yn, zn))


def three_points_colinear_gait(x, y, z) -> int:
    """ThreePointsAreColinear (TT.c:3964): parametric deviation against
    the +-0.0001 window, exact branch/cascade order (note the x[1]==x[2]
    and x[0]!=x[1] case returns 0 without testing y/z)."""
    if x[1] == x[2]:
        if x[0] == x[1]:
            if y[1] == y[2]:
                if y[1] == y[0]:
                    return 1
            elif z[1] == z[2]:
                if z[1] == z[0]:
                    return 1
            else:
                t = (y[0] - y[1]) / (y[2] - y[1])
                t2 = z[0] - (z[1] + (z[2] - z[1]) * t)
                if -0.0001 < t2 < 0.0001:
                    return 1
        return 0
    t = (x[0] - x[1]) / (x[2] - x[1])
    t2 = y[0] - (y[1] + (y[2] - y[1]) * t)
    if -0.0001 < t2 < 0.0001:
        t2 = z[0] - (z[1] + (z[2] - z[1]) * t)
        if -0.0001 < t2 < 0.0001:
            return 1
    return 0


def point_in_areal_gait(px, py, X, Y) -> tuple[int, int]:
    """PointInAreal (TT.c:10086): ray-cast containment + the 1e-5
    on-edge refinement over every ring edge (j = previous vertex)."""
    inside = int(point_inside_poly_gait_ring(
        np.array([px], dtype=np.float64), np.array([py], dtype=np.float64),
        np.asarray(X, dtype=np.float64), np.asarray(Y, dtype=np.float64),
    )[0])
    on_edge = 0
    if inside > 0:
        n = len(X)
        for i in range(n):
            j = n - 1 if i == 0 else i - 1
            d = float(point_to_line_dist2d_gait(px, py, X[j], Y[j], X[i], Y[i]))
            if d < 0.00001:
                on_edge = 1
                break
    return inside, on_edge


def sliver_rating_gait(x, y, z) -> tuple[int, float, float, float]:
    """CalculateSliverRating (TT.c:10438): consecutive-duplicate squeeze
    (bug-compatible single-pass shifting), colinear-corner reduction
    capped at 4 kept corners, then min/max clamped 3D point-to-line over
    the corner set; rated only when <= 3 effective corners survive."""
    x = [float(v) for v in x]
    y = [float(v) for v in y]
    z = [float(v) for v in z]
    vtxcnt = len(x)
    if vtxcnt > 0:
        j = 0
        newV = vtxcnt
        i = 1
        while i < newV:
            if x[j] == x[i] and y[j] == y[i] and z[j] == z[i]:
                newV -= 1
                for k in range(i, vtxcnt):
                    x[k - 1] = x[k]
                    y[k - 1] = y[k]
                    z[k - 1] = z[k]
            j = i
            i += 1
        vtxcnt = newV

    def _wh_from(pts):
        n = len(pts)
        width = height = point_to_line_dist3d_gait(
            *pts[0], *pts[1], *pts[2])
        for i in range(n):
            jj = (i + 1) % n
            kk = (i + 2) % n
            while kk != i:
                w = point_to_line_dist3d_gait(*pts[i], *pts[jj], *pts[kk])
                width = min(width, w)
                height = max(height, w)
                jj = kk
                kk = (kk + 1) % n
        return width, height

    if vtxcnt == 3:
        width = height = point_to_line_dist3d_gait(
            x[0], y[0], z[0], x[1], y[1], z[1], x[2], y[2], z[2])
        w = point_to_line_dist3d_gait(
            x[1], y[1], z[1], x[0], y[0], z[0], x[2], y[2], z[2])
        width = min(width, w)
        height = max(height, w)
        w = point_to_line_dist3d_gait(
            x[2], y[2], z[2], x[0], y[0], z[0], x[1], y[1], z[1])
        width = min(width, w)
        height = max(height, w)
        if height == 0:
            return 1, 0.0, 0.0, 0.0
        return 1, width, height, width / height
    kept = []
    v = vtxcnt - 1
    for i in range(vtxcnt):
        jj = (i + 1) % vtxcnt
        kk = (i + v) % vtxcnt
        tx = [x[i], x[kk], x[jj]]
        ty = [y[i], y[kk], y[jj]]
        tz = [z[i], z[kk], z[jj]]
        if three_points_colinear_gait(tx, ty, tz) == 0:
            kept.append((x[i], y[i], z[i]))
            if len(kept) > 4:
                break
    if len(kept) < 3:
        return 1, 0.0, 0.0, 0.0
    if len(kept) == 3:
        width, height = _wh_from(kept)
        if height == 0:
            return 1, 0.0, 0.0, 0.0
        return 1, width, height, width / height
    return 0, 0.0, 0.0, 0.0


def segments_offset_overlap_gait(x1, y1, x2, y2, x3, y3, x4, y4) -> int:
    """SegmentsOffsetOverlap (TT.c:8893): strict open-interval bbox overlap
    per axis, exact branch order (note the asymmetric second disjunct)."""
    answer = 0
    if x1 < x2:
        if x3 < x4 and x3 < x2 and x4 > x1:
            answer = 1
        elif x4 < x2 and x3 > x1:
            answer = 1
    else:
        if x3 < x4 and x3 < x1 and x4 > x2:
            answer = 1
        elif x4 < x1 and x3 > x2:
            answer = 1
    if answer == 1:
        answer = 0
        if y1 < y2:
            if y3 < y4 and y3 < y2 and y4 > y1:
                answer = 1
            elif y4 < y2 and y3 > y1:
                answer = 1
        else:
            if y3 < y4 and y3 < y1 and y4 > y2:
                answer = 1
            elif y4 < y1 and y3 > y2:
                answer = 1
    return answer


def find_acute_angle_gait(x1, y1, x2, y2, x3, y3, x4, y4) -> float:
    """FindAcuteAngleBetweenSegments (moregeomchecks.c:1591): normalized
    line-equation dot product with the +-0.9999999 clamps (parallel -> 0,
    antiparallel -> pi) and the fold past the 1.57079631345 threshold."""
    a1, b1, _ = line_equation_gait(x1, y1, x2, y2)
    a2, b2, _ = line_equation_gait(x3, y3, x4, y4)
    answer = (a1 * a2) + (b1 * b2)
    if answer >= 0.9999999:
        answer = 0.0
    elif answer < -0.9999999:
        answer = 3.141592653589793
    else:
        import math

        # math.acos wraps the platform libm — the same acos the compiled
        # reference links; np.arccos can differ by an ulp (SIMD path)
        answer = math.acos(answer)
    if answer > 1.57079631345:
        answer = 3.141592653589793 - answer
    return answer
