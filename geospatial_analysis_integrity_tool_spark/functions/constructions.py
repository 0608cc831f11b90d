"""Geometry construction kernels — GAIT's scalar construction functions
(SURVEY.md §2.8 row 3): GrahamScan (moregeomchecks.c:5585), LeastSquaresFit
(:6304), RemoveColinearVertices (:6425).

Pure numpy, vectorized where the shape allows; used inside Arrow-batched
kernels and by the conflation/COLINEAR checks.  The oracle-gated queries use
relational formulations of the same math (integer accumulators, shared
predicate text); these kernels are the imperative twins, property-tested
against those formulations.
"""

from __future__ import annotations

import numpy as np


def graham_scan(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Indices of the convex hull of (xs, ys), counter-clockwise, starting at
    the lexicographically smallest point.  Collinear boundary points are KEPT
    (cross == 0 is not popped) — matching the relational hull-membership rule
    "not strictly inside any triangle of other points".
    """
    n = len(xs)
    if n <= 2:
        return np.arange(n)
    order = np.lexsort((ys, xs))
    pts = np.stack([xs[order], ys[order]], axis=1)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(idx_iter):
        hull: list[int] = []
        for i in idx_iter:
            while (
                len(hull) >= 2
                and cross(pts[hull[-2]], pts[hull[-1]], pts[i]) < 0
            ):
                hull.pop()
            hull.append(i)
        return hull

    lower = half(range(len(pts)))
    upper = half(range(len(pts) - 1, -1, -1))
    idx = lower[:-1] + upper[:-1]
    # de-dup while preserving order (collinear keeps can repeat endpoints)
    seen: set[int] = set()
    out = [i for i in idx if not (i in seen or seen.add(i))]
    return order[np.array(out, dtype=np.int64)]


def least_squares_fit(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float]:
    """(slope, intercept) of the least-squares line y = a*x + b.

    Accumulators follow the reference's running-sum formulation
    (LeastSquaresFit moregeomchecks.c:6304); degenerate (vertical) input
    returns (inf, nan).
    """
    n = len(xs)
    sx = float(np.sum(xs))
    sy = float(np.sum(ys))
    sxx = float(np.sum(xs * xs))
    sxy = float(np.sum(xs * ys))
    den = n * sxx - sx * sx
    if den == 0.0:
        return float("inf"), float("nan")
    a = (n * sxy - sx * sy) / den
    return a, (sy - a * sx) / n


def remove_colinear_vertices(
    xs: np.ndarray, ys: np.ndarray, tol: float = 1e-12
) -> np.ndarray:
    """Boolean keep-mask: False for interior vertices whose turn cross-product
    magnitude is below tol (RemoveColinearVertices semantics: the vertex adds
    no shape information).  Endpoints are always kept."""
    n = len(xs)
    keep = np.ones(n, dtype=bool)
    if n < 3:
        return keep
    ux = xs[1:-1] - xs[:-2]
    uy = ys[1:-1] - ys[:-2]
    wx = xs[2:] - xs[1:-1]
    wy = ys[2:] - ys[1:-1]
    cross = ux * wy - uy * wx
    keep[1:-1] = np.abs(cross) >= tol
    return keep
