"""S2 + aperture-7 hex cell encode tests: determinism, structure, hierarchy
(BASELINE.md tile-assignment invariant)."""

from __future__ import annotations

import numpy as np

from geospatial_analysis_integrity_tool_spark.functions import cells_hex, cells_s2


def rand_latlng(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-65, 65, n), rng.uniform(-179.9, 179.9, n)


# --- S2 -----------------------------------------------------------------------
def test_s2_face_selection():
    lat = np.array([0.0, 0.0, 89.9, 0.0, 0.0, -89.9])
    lng = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    cid = cells_s2.cell_id_from_lat_lng(lat, lng, 10)
    faces = (cid >> np.int64(61)) & np.int64(7)
    assert list(faces) == [0, 1, 2, 3, 4, 5]


def test_s2_level_and_lsb():
    lat, lng = rand_latlng(100)
    for level in (10, 13, 16, 30):
        cid = cells_s2.cell_id_from_lat_lng(lat, lng, level)
        assert (cells_s2.level_of(cid) == level).all()
        # trailing-one structure: exactly one low bit set at 2*(30-level)
        lsb = cid & -cid
        assert (lsb == np.int64(1) << np.int64(2 * (30 - level))).all()


def test_s2_parent_contains_child():
    lat, lng = rand_latlng(500)
    child = cells_s2.cell_id_from_lat_lng(lat, lng, 16)
    for lvl in (10, 12, 14):
        par_direct = cells_s2.cell_id_from_lat_lng(lat, lng, lvl)
        par_derived = cells_s2.parent(child, lvl)
        assert (par_direct == par_derived).all()
        lo, hi = cells_s2.cell_range(par_direct)
        assert ((child >= lo) & (child <= hi)).all()


def test_s2_determinism_and_locality():
    lat, lng = rand_latlng(1000, seed=42)
    a = cells_s2.cell_id_from_lat_lng(lat, lng, 12)
    b = cells_s2.cell_id_from_lat_lng(lat.copy(), lng.copy(), 12)
    assert (a == b).all()
    # nearby points (1e-7 deg) nearly always share a level-12 cell
    c = cells_s2.cell_id_from_lat_lng(lat + 1e-9, lng, 12)
    assert (a == c).mean() > 0.999


def test_s2_distinct_cells_scale_by_4():
    lat, lng = rand_latlng(20000, seed=3)
    n1 = len(np.unique(cells_s2.cell_id_from_lat_lng(lat, lng, 4)))
    n2 = len(np.unique(cells_s2.cell_id_from_lat_lng(lat, lng, 5)))
    assert 2.5 < n2 / n1 < 5.5  # ~4x cells per level (below point saturation)


# --- hex (aperture 7) ---------------------------------------------------------
def test_hex_determinism():
    lat, lng = rand_latlng(1000)
    a = cells_hex.hex_cell(lat, lng, 9)
    b = cells_hex.hex_cell(lat.copy(), lng.copy(), 9)
    assert (a == b).all()
    assert (cells_hex.hex_res(a) == 9).all()


def test_hex_parent_truncation_consistent():
    lat, lng = rand_latlng(2000, seed=11)
    child = cells_hex.hex_cell(lat, lng, 9)
    par = cells_hex.hex_parent(child, 8)
    assert (cells_hex.hex_res(par) == 8).all()
    # truncation parent mostly equals direct coarse assignment (points near
    # hex edges legitimately differ — same property as real H3 cell edges)
    direct = cells_hex.hex_cell(lat, lng, 8)
    assert (par == direct).mean() > 0.6
    # parent is a pure function of the child id
    par2 = cells_hex.hex_parent(cells_hex.hex_cell(lat, lng, 9), 8)
    assert (par == par2).all()


def test_hex_aperture7_fanout():
    # dense points in a small window, coarse resolutions -> cells unsaturated
    rng = np.random.default_rng(5)
    lat = rng.uniform(10, 25, 50000)
    lng = rng.uniform(10, 25, 50000)
    c3 = cells_hex.hex_cell(lat, lng, 3)
    c4 = cells_hex.hex_cell(lat, lng, 4)
    ratio = len(np.unique(c4)) / len(np.unique(c3))
    assert 4.0 < ratio < 10.0  # aperture-7 area scaling

    # digit-truncation children per parent never exceed 7
    par = cells_hex.hex_parent(c4, 3)
    pairs: dict[int, set[int]] = {}
    for p, c in zip(par.tolist(), c4.tolist()):
        pairs.setdefault(p, set()).add(c)
    assert max(len(v) for v in pairs.values()) <= 7


def test_hex_res_range():
    lat, lng = rand_latlng(100)
    for res in (0, 7, 12):
        c = cells_hex.hex_cell(lat, lng, res)
        assert (cells_hex.hex_res(c) == res).all()
    import pytest

    with pytest.raises(ValueError):
        cells_hex.hex_cell(lat, lng, 13)


def test_hex_locality():
    lat, lng = rand_latlng(1000, seed=13)
    a = cells_hex.hex_cell(lat, lng, 10)
    c = cells_hex.hex_cell(lat + 1e-9, lng, 10)
    assert (a == c).mean() > 0.999


# --- invariant-gate sensitivity (the DuckDB twin of geo_encode_cells states
# zero violations; these prove the Spark-side counters actually fire on a
# corrupted kernel output, so the gate is not vacuously green) ---------------
def test_cell_invariant_gate_catches_corruption(spark):
    import pyspark.sql.functions as F

    from geospatial_analysis_integrity_tool_spark.operators.encode import (
        encode_cells,
    )
    from geospatial_analysis_integrity_tool_spark.queries.nonsql import (
        _cell_pair_stats,
    )

    lat, lng = rand_latlng(200, seed=7)
    pdf = __import__("pandas").DataFrame({"lat": lat, "lon": lng})
    enc = encode_cells(spark.createDataFrame(pdf), hex_res=(7, 9, 12),
                       s2_levels=(10, 13, 16))

    clean = _cell_pair_stats(enc, "s2", 13, 16).collect()[0]
    assert clean.prefix_violations == 0 and clean.fanout_violations == 0

    # flip one mid bit of the level-16 id -> derived parent no longer matches
    broken = enc.withColumn(
        "s2_l16",
        F.when(F.rand(1) < 0.1,
               F.expr("CAST(s2_l16 AS BIGINT) ^ CAST(1 AS BIGINT) << 40")
               ).otherwise(F.col("s2_l16")),
    )
    row = _cell_pair_stats(broken, "s2", 13, 16).collect()[0]
    assert row.prefix_violations > 0

    # corrupt the hex res nibble -> packing well-formedness fires
    broken_hex = enc.withColumn(
        "hex_r12", F.expr("hex_r12 ^ (CAST(1 AS BIGINT) << 59)")
    )
    row = _cell_pair_stats(broken_hex, "hex", 9, 12).collect()[0]
    assert row.prefix_violations > 0
