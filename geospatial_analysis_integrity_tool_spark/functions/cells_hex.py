"""Aperture-7 hierarchical hex index (H3-structure), vectorized numpy.

Implements the *published H3 index structure* — aperture-7 hexagon hierarchy
with alternating Class II / Class III lattice orientation, digit extraction via
the documented integer ``upAp7``/``upAp7r``/``downAp7``/``downAp7r`` coordinate
transforms, and H3-style bit packing (resolution nibble + 3-bit digit per
level, unused digits set to 7) — over a **cube-face base layer** rather than
H3's 122 icosahedral base cells (the icosahedron base-cell table is not
reproducible here without the upstream library; the cube face reuses this
engine's S2 face projection).  Cell ids are therefore *not* interchangeable
with libh3 ids; they satisfy the same contracts the engine needs:

* deterministic: same (lat, lng, res) -> same id on every run / partitioning
  (BASELINE.md tile-assignment invariant);
* exact hierarchy: ``parent(cell(p, r)) == cell_at_parent_digits`` by
  construction (digit truncation, like H3's h3ToParent);
* aperture 7: each parent has exactly 7 child digit positions;
* resolutions 0..12 (the north rule exercises 7..12).

No code from the h3 library is used; transforms follow the public H3
documentation of the aperture-7 ijk arithmetic.
"""

from __future__ import annotations

import numpy as np

from .cells_s2 import _lat_lng_to_xyz, _xyz_to_face_uv

MAX_RES = 12
_SQRT7 = np.sqrt(7.0)
# Class III rotation: asin(sqrt(3/28)) ~ 19.106 deg (published constant)
_AP7_ROT = np.arcsin(np.sqrt(3.0 / 28.0))
_SQRT3_2 = np.sqrt(3.0) / 2.0
# res-0 hex circumradius in face (u, v) units
_RES0_SIZE = 0.35

# CoordIJK unit vectors per digit (H3 order: CENTER, K, J, JK, I, IK, IJ)
_UNIT_VECS = np.array(
    [
        [0, 0, 0],
        [0, 0, 1],
        [0, 1, 0],
        [0, 1, 1],
        [1, 0, 0],
        [1, 0, 1],
        [1, 1, 0],
    ],
    dtype=np.int64,
)
# digit lookup: (i, j, k) normalized unit vec -> digit index
_DIGIT_OF = {tuple(v): d for d, v in enumerate(_UNIT_VECS.tolist())}


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5).astype(np.int64)


def _normalize_ijk(i, j, k):
    """H3 ijk normalization: subtract min so all components >= 0, min == 0."""
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def _hex2d_to_ijk(x: np.ndarray, y: np.ndarray):
    """Fractional face 2d -> nearest hex center in ijk: flat-top axial
    decomposition, cube rounding, then the H3 ijk representation
    (axial q = i - k, r = j - k; normalized so min component is 0)."""
    # invert H3's _ijkToHex2d embedding: x = a - b/2, y = b * sqrt(3)/2
    bf = y / _SQRT3_2
    af = x + 0.5 * bf
    xf, zf = af, bf
    yf = -af - bf
    xi = _round_half_away(xf)
    yi = _round_half_away(yf)
    zi = _round_half_away(zf)
    dx = np.abs(xi - xf)
    dy = np.abs(yi - yf)
    dz = np.abs(zi - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    fix_z = ~fix_x & ~fix_y
    xi = np.where(fix_x, -yi - zi, xi)
    yi = np.where(fix_y, -xi - zi, yi)
    zi = np.where(fix_z, -xi - yi, zi)
    return _normalize_ijk(xi, zi, np.zeros_like(xi))


def _up_ap7(i, j, k, class_iii: bool):
    a = i - k
    b = j - k
    if class_iii:
        ni = _round_half_away((3.0 * a - b) / 7.0)
        nj = _round_half_away((a + 2.0 * b) / 7.0)
    else:
        ni = _round_half_away((2.0 * a + b) / 7.0)
        nj = _round_half_away((3.0 * b - a) / 7.0)
    nk = np.zeros_like(ni)
    return _normalize_ijk(ni, nj, nk)


def _down_ap7(i, j, k, class_iii: bool):
    if class_iii:
        ni = 3 * i + 1 * j + 0 * k
        nj = 0 * i + 3 * j + 1 * k
        nk = 1 * i + 0 * j + 3 * k
    else:
        ni = 3 * i + 0 * j + 1 * k
        nj = 1 * i + 3 * j + 0 * k
        nk = 0 * i + 1 * j + 3 * k
    return _normalize_ijk(ni, nj, nk)


def _digits_from_leaf(i, j, k, res: int):
    """Extract per-res digits by successive upAp7 (H3 _faceIjkToH3 loop)."""
    digits = np.zeros((res, len(i)), dtype=np.int64)
    ci, cj, ck = i, j, k
    for r in range(res, 0, -1):
        class_iii = r % 2 == 1
        pi, pj, pk = _up_ap7(ci, cj, ck, class_iii)
        di, dj, dk = _down_ap7(pi, pj, pk, class_iii)
        ui, uj, uk = _normalize_ijk(ci - di, cj - dj, ck - dk)
        d = np.zeros_like(ui)
        for vec, dig in _DIGIT_OF.items():
            m = (ui == vec[0]) & (uj == vec[1]) & (uk == vec[2])
            d = np.where(m, dig, d)
        digits[r - 1] = d
        ci, cj, ck = pi, pj, pk
    return digits, (ci, cj, ck)  # res-0 ijk remains


def hex_cell(lat_deg, lng_deg, res: int) -> np.ndarray:
    """Vectorized hex cell id at resolution 0..12.

    Packing (63 bits):  [res:4][face:3][i0+32:7][j0+32:7][digit_1..digit_12:3*12]
    with unused digit slots filled with 7 (H3 convention).
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be 0..{MAX_RES}")
    lat = np.atleast_1d(np.asarray(lat_deg, dtype=np.float64))
    lng = np.atleast_1d(np.asarray(lng_deg, dtype=np.float64))
    x, y, z = _lat_lng_to_xyz(lat, lng)
    face, u, v = _xyz_to_face_uv(x, y, z)

    # face 2d -> res-r lattice frame: scale by sqrt(7)^res; Class III res get
    # the fixed aperture-7 rotation (published H3 _geoToHex2d behavior)
    su = u / _RES0_SIZE
    sv = v / _RES0_SIZE
    scale = _SQRT7**res
    if res % 2 == 1:
        # Class III: rotate by -AP7_ROT (H3 _geoToHex2d subtracts the angle)
        c, s = np.cos(_AP7_ROT), np.sin(-_AP7_ROT)
        su, sv = su * c - sv * s, su * s + sv * c
    su = su * scale
    sv = sv * scale

    i, j, k = _hex2d_to_ijk(su, sv)
    if res > 0:
        digits, (i0, j0, k0) = _digits_from_leaf(i, j, k, res)
    else:
        digits = np.zeros((0, len(i)), dtype=np.int64)
        i0, j0, k0 = i, j, k

    # res-0 axial coords (k normalized to 0): clamp into the packing range
    a0 = np.clip(i0 - k0 + 32, 0, 127)
    b0 = np.clip(j0 - k0 + 32, 0, 127)

    out = (
        (np.int64(res) << np.int64(59))
        | (face.astype(np.int64) << np.int64(56))
        | (a0.astype(np.int64) << np.int64(49))
        | (b0.astype(np.int64) << np.int64(42))
    )
    for slot in range(MAX_RES):
        shift = np.int64(42 - 3 * (slot + 1))
        if slot < res:
            out = out | (digits[slot] << shift)
        else:
            out = out | (np.int64(7) << shift)
    return out


def hex_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Truncate digits to the parent resolution (H3 h3ToParent semantics)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> np.int64(59)) & np.int64(0xF)
    if (parent_res > res).any():
        raise ValueError("parent_res must be <= cell res")
    out = (cell & ~(np.int64(0xF) << np.int64(59))) | (
        np.int64(parent_res) << np.int64(59)
    )
    for slot in range(parent_res, MAX_RES):
        shift = np.int64(42 - 3 * (slot + 1))
        out = out | (np.int64(7) << shift)
    return out


def hex_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> np.int64(59)) & np.int64(0xF)
