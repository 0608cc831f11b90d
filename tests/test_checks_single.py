"""Golden-row tests for the single-feature check kernels (FIXTURES.md §6)."""

from __future__ import annotations

from geospatial_analysis_integrity_tool_spark.operators.checks_single import (
    SingleFeatureTolerances,
    single_feature_checks,
)

TOL = SingleFeatureTolerances(
    seglen_m=150.0,
    shortfeat_m=400.0,
    longfeat_m=1400.0,
    smallarea_m2=20000.0,
    perimlen_m=700.0,
    sliver_ratio=0.01,
)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows,
        "feature_id long, fcode string, geom_type int, xs array<double>, ys array<double>",
    )
    out = single_feature_checks(df, TOL).collect()
    return {(r.feature_id, r.errtype) for r in out}, {
        (r.feature_id, r.errtype): r.magnitude_mm for r in out
    }


def test_selfx_bowtie_loops(spark):
    """selfx_01: bowtie line -> LOOPS (TT.c:43064)."""
    got, _ = _run(
        spark,
        [
            # bowtie: crosses itself between segment 0 and segment 2
            (1, "AP030", 2, [0.0, 0.01, 0.01, 0.0], [40.0, 40.01, 40.0, 40.01]),
            # straight line: clean
            (2, "AP030", 2, [0.0, 0.01, 0.02, 0.03], [40.0, 40.0, 40.0, 40.0]),
        ],
    )
    assert (1, "LOOPS") in got
    assert (2, "LOOPS") not in got


def test_v_dups(spark):
    """dup vertex within one feature -> V_DUPS 20."""
    got, mag = _run(
        spark,
        [
            (1, "AP030", 2, [0.0, 0.01, 0.01, 0.02], [40.0, 40.0, 40.0, 40.0]),
            (2, "AP030", 2, [0.0, 0.01, 0.02, 0.03], [40.0, 40.0, 40.0, 40.0]),
        ],
    )
    assert (1, "V_DUPS") in got and (2, "V_DUPS") not in got
    assert mag[(1, "V_DUPS")] == 1000  # one dup pair, magnitude = count * 1000


def test_sliver_triangle(spark):
    """sliver_tri_01: area/perimeter^2 << 0.01 -> SLIVER (+SMALLAREA)."""
    # ~890 m base, 2 m height
    got, _ = _run(
        spark,
        [
            (1, "FA000", 3, [10.0, 10.008, 10.004], [40.0, 40.0, 40.00002]),
            # fat triangle ~ equilateral-ish, area ~ big, ratio ~ 0.04
            (2, "FA000", 3, [10.0, 10.01, 10.005], [40.0, 40.0, 40.008]),
        ],
    )
    assert (1, "SLIVER") in got and (1, "SMALLAREA") in got
    assert (2, "SLIVER") not in got and (2, "SMALLAREA") not in got


def test_line_length_checks(spark):
    got, mag = _run(
        spark,
        [
            # ~85 m + ~85 m: SEGLEN (both short) + SHORTFEAT (<400)
            (1, "AP030", 2, [10.0, 10.001, 10.002], [40.0, 40.0, 40.0]),
            # ~850 m edges: LONGFEAT (>1400)
            (2, "AP030", 2, [10.0, 10.01, 10.02], [40.0, 40.0, 40.0]),
        ],
    )
    assert (1, "SEGLEN") in got and (1, "SHORTFEAT") in got
    assert (2, "LONGFEAT") in got and (2, "SEGLEN") not in got
    # magnitude sanity: ~85.2m edge in mm
    assert 85000 < mag[(1, "SEGLEN")] < 86000


def test_empty_and_degenerate(spark):
    # single-vertex / empty geometries must not crash or emit
    got, _ = _run(
        spark,
        [
            (1, "AP030", 2, [10.0], [40.0]),
            (2, "FA000", 3, [10.0, 10.001], [40.0, 40.0]),
        ],
    )
    assert not any(fid == 1 for fid, _ in got)
