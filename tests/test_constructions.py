"""Geometry construction kernels vs brute-force / relational oracles."""

from __future__ import annotations

import numpy as np
import pytest

from geospatial_analysis_integrity_tool_spark.functions.constructions import (
    graham_scan,
    least_squares_fit,
    remove_colinear_vertices,
)


def _hull_members_bruteforce(xs, ys):
    """The relational rule: on hull iff not strictly inside any triangle of
    OTHER points (same rule the geo_convex_hull_stats oracle evaluates)."""
    n = len(xs)
    out = set(range(n))
    for p in range(n):
        for a in range(n):
            for b in range(a + 1, n):
                for c in range(b + 1, n):
                    if p in (a, b, c):
                        continue
                    d1 = (xs[b] - xs[a]) * (ys[p] - ys[a]) - (ys[b] - ys[a]) * (xs[p] - xs[a])
                    d2 = (xs[c] - xs[b]) * (ys[p] - ys[b]) - (ys[c] - ys[b]) * (xs[p] - xs[b])
                    d3 = (xs[a] - xs[c]) * (ys[p] - ys[c]) - (ys[a] - ys[c]) * (xs[p] - xs[c])
                    if (d1 > 0 and d2 > 0 and d3 > 0) or (d1 < 0 and d2 < 0 and d3 < 0):
                        out.discard(p)
    return out


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_graham_scan_matches_relational_rule(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 12))
    xs = rng.uniform(0, 1, n)
    ys = rng.uniform(0, 1, n)
    hull = set(graham_scan(xs, ys).tolist())
    assert hull == _hull_members_bruteforce(xs, ys)


def test_graham_scan_square_with_interior():
    xs = np.array([0.0, 1.0, 1.0, 0.0, 0.5])
    ys = np.array([0.0, 0.0, 1.0, 1.0, 0.5])
    assert set(graham_scan(xs, ys).tolist()) == {0, 1, 2, 3}


def test_least_squares_fit_exact_line():
    xs = np.array([0.0, 1.0, 2.0, 3.0])
    ys = 2.5 * xs + 1.25
    a, b = least_squares_fit(xs, ys)
    assert abs(a - 2.5) < 1e-12 and abs(b - 1.25) < 1e-12


def test_least_squares_fit_vertical_degenerate():
    xs = np.array([1.0, 1.0, 1.0])
    ys = np.array([0.0, 1.0, 2.0])
    a, b = least_squares_fit(xs, ys)
    assert a == float("inf")


def test_remove_colinear_vertices():
    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = np.array([0.0, 0.0, 0.0, 1.0, 2.0])
    keep = remove_colinear_vertices(xs, ys)
    # vertices 1, 2? vertex 1 is collinear (0-1-2 flat); vertex 2 turns;
    # vertex 3 is collinear (2-3-4 same slope)
    assert keep.tolist() == [True, False, True, False, True]
