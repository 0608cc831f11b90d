"""S2 cell-id encode (levels 0..30), vectorized numpy, no external deps.

Implements the published S2 cell-id scheme (s2geometry docs): lat/lng -> unit
XYZ -> cube face (largest |component|) -> gnomonic (u, v) -> quadratic ST
transform -> leaf (i, j) at level 30 -> Hilbert curve position (per-level
lookup tables with swap/invert orientation masks) -> 64-bit id
``face(3 bits) | hilbert_pos(2*level bits) | 1`` with trailing zeros.

Determinism is the contract (BASELINE.md "identical ... cell ids per feature
across runs/parallelism"): every step is integer or IEEE-exact double math.
Levels 10-16 are the engine's tiling range (north rule).

No code is taken from any S2 library; this follows the published algorithm
description.  Validated by structural tests (face selection, round-trip,
parent containment, Hilbert adjacency) in tests/test_cells.py.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

# Hilbert sub-cell orderings (S2 doc values)
SWAP_MASK = 0x1
INVERT_MASK = 0x2
_POS_TO_ORIENTATION = np.array([SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK], dtype=np.int64)
# kPosToIJ[orientation][pos] = ij  (ij = (i_bit << 1) | j_bit)
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.int64,
)
# inverse: kIJtoPos[orientation][ij] = pos
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p


def _lat_lng_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray):
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az), np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        for f, (ue, ve) in enumerate(
            [
                (y / x, z / x),       # face 0: +x
                (-x / y, z / y),      # face 1: +y
                (-x / z, -y / z),     # face 2: +z
                (z / x, y / x),       # face 3: -x
                (z / y, -x / y),      # face 4: -y
                (-y / z, -x / z),     # face 5: -z
            ]
        ):
            m = face == f
            u[m] = ue[m]
            v[m] = ve[m]
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (the library default)."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    ij = np.floor(s * (1 << MAX_LEVEL)).astype(np.int64)
    return np.clip(ij, 0, (1 << MAX_LEVEL) - 1)


def cell_id_from_lat_lng(lat_deg, lng_deg, level: int) -> np.ndarray:
    """Vectorized S2CellId at the given level for arrays of lat/lng degrees."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be 0..{MAX_LEVEL}")
    x, y, z = _lat_lng_to_xyz(lat_deg, lng_deg)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))

    n = face.shape[0] if face.ndim else 1
    orientation = face & SWAP_MASK
    pos = np.zeros(n, dtype=np.int64)
    for k in range(level):
        shift = MAX_LEVEL - 1 - k
        i_bit = (i >> shift) & 1
        j_bit = (j >> shift) & 1
        ij = (i_bit << 1) | j_bit
        p = _IJ_TO_POS[orientation, ij]
        pos = (pos << 2) | p
        orientation = orientation ^ _POS_TO_ORIENTATION[p]

    # id = face(3) . pos(2*level) . 1 . zeros(2*(30-level)+... ) within 64 bits:
    # leaf layout is face(3) + 2*30 pos bits + trailing 1 = 64 bits.
    shift_bits = 2 * (MAX_LEVEL - level) + 1
    base = (face.astype(np.int64) << np.int64(61)) | (pos << np.int64(shift_bits))
    return base | np.int64(1 << (shift_bits - 1))


def level_of(cell_id: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    cid = np.asarray(cell_id, dtype=np.int64)
    lsb = cid & -cid
    return (MAX_LEVEL - np.round(np.log2(lsb.astype(np.float64))) / 2).astype(np.int64)


def parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell at the given (coarser) level."""
    cid = np.asarray(cell_id, dtype=np.int64)
    new_lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - level))
    return (cid & ~((new_lsb << np.int64(1)) - np.int64(1))) | new_lsb


def cell_range(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[range_min, range_max] of leaf ids contained in the cell — the interval
    used for containment joins (child in parent <=> min <= child <= max)."""
    cid = np.asarray(cell_id, dtype=np.int64)
    lsb = cid & -cid
    return cid - lsb + 1, cid + lsb - 1
