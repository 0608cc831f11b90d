"""Variable-vertex geometry operators (RawLinear/RawAreal array model):
segment explode, line x line intersections, LOOPS self-intersection, and the
hole-aware even-odd containment used by geo_line_area / geo_area_overlap.

Oracle: brute-force numpy over the same fixtures.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geospatial_analysis_integrity_tool_spark.operators.intersections import (
    line_intersections,
    segments_of_lines,
    self_intersections,
    vertices_to_lines,
)

SF = "/root/testdata/sf0.001"


def _rand_lines(n_lines=40, seed=7):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_lines):
        nv = int(rng.integers(2, 12))
        xs = np.cumsum(rng.uniform(-1.0, 1.2, nv)) / 100.0 + 10.0
        ys = np.cumsum(rng.uniform(-1.0, 1.1, nv)) / 100.0 + 40.0
        out.append((i, [float(v) for v in xs], [float(v) for v in ys]))
    return out


def _brute_crossings(rows):
    def segs(xs, ys):
        return [
            (xs[k], ys[k], xs[k + 1], ys[k + 1], k + 1)
            for k in range(len(xs) - 1)
        ]

    def orient(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    def proper(a, b):
        d1 = orient(a[0], a[1], a[2], a[3], b[0], b[1])
        d2 = orient(a[0], a[1], a[2], a[3], b[2], b[3])
        d3 = orient(b[0], b[1], b[2], b[3], a[0], a[1])
        d4 = orient(b[0], b[1], b[2], b[3], a[2], a[3])
        return (
            (d1 > 0) != (d2 > 0)
            and (d3 > 0) != (d4 > 0)
            and d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0
        )

    pairs = set()
    loops = set()
    for i, (ida, xsa, ysa) in enumerate(rows):
        sa = segs(xsa, ysa)
        for sb1 in sa:
            for sb2 in sa:
                if sb2[4] > sb1[4] + 1 and proper(sb1, sb2):
                    loops.add((ida, sb1[4], sb2[4]))
        for idb, xsb, ysb in rows[i + 1:]:
            for s1 in sa:
                for s2 in segs(xsb, ysb):
                    if proper(s1, s2):
                        pairs.add((ida, idb, s1[4], s2[4]))
    return pairs, loops


@pytest.fixture(scope="module")
def rand_lines_df(spark):
    rows = _rand_lines()
    df = spark.createDataFrame(rows, "line_id long, xs array<double>, ys array<double>")
    return rows, df


def test_segments_of_lines_explode(spark, rand_lines_df):
    rows, df = rand_lines_df
    segs = segments_of_lines(df).collect()
    expected_n = sum(len(xs) - 1 for _, xs, _ in rows)
    assert len(segs) == expected_n
    by_line = {}
    for r in segs:
        by_line.setdefault(r.line_id, []).append(r)
    for lid, xs, ys in rows:
        ss = sorted(by_line[lid], key=lambda r: r.seg_idx)
        assert [r.seg_idx for r in ss] == list(range(1, len(xs)))
        assert ss[0].sax == xs[0] and ss[-1].sbx == xs[-1]


def test_line_intersections_vs_brute(spark, rand_lines_df):
    rows, df = rand_lines_df
    expected, _ = _brute_crossings(rows)
    got = {
        (r.id_a, r.id_b, r.seg_a, r.seg_b)
        for r in line_intersections(df, cell_deg=0.01).collect()
    }
    assert got == expected


def test_self_intersections_vs_brute(spark, rand_lines_df):
    rows, df = rand_lines_df
    _, expected = _brute_crossings(rows)
    got = {
        (r.line_id, r.seg_a, r.seg_b)
        for r in self_intersections(df).collect()
    }
    assert got == expected


def test_vertices_to_lines_sorts_and_carries_extra(spark):
    v = spark.createDataFrame(
        [(1, 2, 12.0, 42.0, 9.0), (1, 0, 10.0, 40.0, 7.0), (1, 1, 11.0, 41.0, 8.0)],
        "line_id long, vidx long, x double, y double, z double",
    )
    row = vertices_to_lines(v, extra=("z",)).collect()[0]
    assert row.xs == [10.0, 11.0, 12.0]
    assert row.ys == [40.0, 41.0, 42.0]
    assert row.z == [7.0, 8.0, 9.0]


def test_inside_pairs_hole_aware(spark):
    """Even-odd parity over all rings: point in hole is OUTSIDE."""
    from geospatial_analysis_integrity_tool_spark.queries.vgeomq import (
        _area_edges,
        _inside_pairs,
    )

    # square [0,4]^2 with hole [1,3]^2 as geo_vareas-shaped long form
    rows = []
    for k, (x, y) in enumerate([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]):
        rows.append((99, 0, k, x, y))
    for k, (x, y) in enumerate([(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)]):
        rows.append((99, 1, k, x, y))
    spark.createDataFrame(
        rows, "area_id long, ring long, vidx long, x double, y double"
    ).createOrReplaceTempView("geo_vareas")
    probes = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 2.0, 2.0), (3, 5.0, 5.0), (4, 0.5, 2.0)],
        "pid long, px double, py double",
    )
    edges = _area_edges(spark)
    got = {
        r.pid
        for r in _inside_pairs(spark, edges, probes, ["pid"]).collect()
    }
    assert got == {1, 4}  # in annulus; 2 is in the hole, 3 outside
