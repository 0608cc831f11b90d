"""Single-feature geometry checks (no joins) — GAIT's size/composition groups.

Reference semantics (SURVEY.md §2.4/§2.5; emitted per feature in CheckRegion's
single-feature sections, TT.c:43064ff):

* SEGLEN 1    — shortest segment below tolerance
* PERIMLEN 2  — areal perimeter below tolerance
* SMALLAREA 3 — areal area below tolerance
* SHORTFEAT 4 — line total length below tolerance
* LONGFEAT 7  — line total length above tolerance
* SLIVER      — area / perimeter^2 ratio below threshold (errors.c:21801
                default sensitivity family)
* V_DUPS 20   — consecutive duplicate vertices (exact compare)
* AREAUNCLOSED— explicit ring whose last vertex differs from the first
* LOOPS 108   — self-intersecting line (proper crossing of non-adjacent
                segments; TT.c:43064 LOOPS emission)

Execution shape: one ``mapInPandas`` pass; every computation is vectorized
across the batch with a short loop over the (small, bounded) vertex index —
never over rows.  Measurements use the poly-cos local frame with explicit
left-to-right accumulation so each magnitude is bit-identical to the SQL
oracle's arithmetic (see functions/geodesy.py rationale).

Magnitudes are reported as ``floor(x * 1000)`` BIGINT (GAIT's 3-decimal
truncation, TT.c:709 / utilities.c:97, in integer form).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.geodesy import coslat_poly_np, equirect_dist_m_poly_np
from ..functions.geometry import pad_rings, segments_intersect


@dataclass(frozen=True)
class SingleFeatureTolerances:
    seglen_m: float = 150.0
    shortfeat_m: float = 400.0
    longfeat_m: float = 1400.0
    smallarea_m2: float = 20000.0
    perimlen_m: float = 700.0
    sliver_ratio: float = 0.01


CHECK_OUT_SCHEMA = (
    "feature_id long, fcode string, errtype string, magnitude_mm long, geom_kind string"
)


def _seq_edge_stats(X, Y, V, closed: bool):
    """Sequential (left-to-right) edge lengths in the poly-cos frame.

    Returns (total_len, min_edge, max_edge) with NaN-safe masking; the
    accumulation order matches a left-associated SQL `d01 + d12 + ...` chain.
    """
    n, m = X.shape
    total = np.zeros(n)
    min_e = np.full(n, np.inf)
    max_e = np.zeros(n)
    lens = V.sum(axis=1)
    last = np.maximum(lens - 1, 0)
    for i in range(m - 1):
        valid = (i + 1) < lens
        d = equirect_dist_m_poly_np(X[:, i], Y[:, i], X[:, i + 1], Y[:, i + 1])
        d = np.where(valid, d, 0.0)
        total = total + d
        min_e = np.where(valid & (d < min_e), d, min_e)
        max_e = np.where(valid & (d > max_e), d, max_e)
    if closed:
        rows = np.arange(n)
        d = equirect_dist_m_poly_np(
            X[rows, last], Y[rows, last], X[:, 0], Y[:, 0]
        )
        valid = lens >= 3
        d = np.where(valid, d, 0.0)
        total = total + d
        min_e = np.where(valid & (d < min_e), d, min_e)
        max_e = np.where(valid & (d > max_e), d, max_e)
    return total, np.where(np.isinf(min_e), 0.0, min_e), max_e


def _seq_area_m2(X, Y, V):
    """Shoelace with sequential accumulation in the poly-cos meter frame,
    mean-latitude scale computed left-to-right (matches the SQL oracle)."""
    n, m = X.shape
    lens = V.sum(axis=1)
    lat_acc = np.zeros(n)
    for i in range(m):
        lat_acc = lat_acc + np.where(V[:, i], Y[:, i], 0.0)
    mean_lat = lat_acc / np.maximum(lens, 1)
    mlon = 111319.5 * coslat_poly_np(mean_lat)
    XM = X * mlon[:, None]
    YM = Y * 111319.5
    acc = np.zeros(n)
    rows = np.arange(n)
    last = np.maximum(lens - 1, 0)
    for i in range(m - 1):
        valid = (i + 1) < lens
        t = XM[:, i] * YM[:, i + 1] - XM[:, i + 1] * YM[:, i]
        acc = acc + np.where(valid, t, 0.0)
    t = XM[rows, last] * YM[:, 0] - XM[:, 0] * YM[rows, last]
    acc = acc + np.where(lens >= 3, t, 0.0)
    return np.abs(acc) * 0.5


def _v_dups(X, Y, V):
    n, m = X.shape
    cnt = np.zeros(n, dtype=np.int64)
    for i in range(m - 1):
        valid = V[:, i] & V[:, i + 1]
        cnt += (valid & (X[:, i] == X[:, i + 1]) & (Y[:, i] == Y[:, i + 1])).astype(
            np.int64
        )
    return cnt


def _self_intersects(X, Y, V):
    """Proper crossing between non-adjacent segments of each feature."""
    n, m = X.shape
    out = np.zeros(n, dtype=bool)
    nseg = V.sum(axis=1) - 1
    for i in range(m - 1):
        for j in range(i + 2, m - 1):
            valid = j <= nseg - 1  # both segments exist (i < j)
            if not valid.any():
                continue
            hit = segments_intersect(
                X[:, i], Y[:, i], X[:, i + 1], Y[:, i + 1],
                X[:, j], Y[:, j], X[:, j + 1], Y[:, j + 1],
                proper_only=True,
            )
            out |= np.where(valid, hit, False)
    return out


def _trunc_mm(v: np.ndarray) -> np.ndarray:
    return np.floor(v * 1000.0).astype(np.int64)


def single_feature_checks(
    features: DataFrame,
    tol: SingleFeatureTolerances = SingleFeatureTolerances(),
) -> DataFrame:
    """features (feature_id, fcode, geom_type, xs, ys) -> condition rows.

    geom_type: 2 = line (open), 3 = area (implicitly closed ring).

    Runs under ``mapInArrow``: vertex arrays decode straight from the Arrow
    list buffers into padded matrices (functions/arrowpad.py) — the
    pandas/tolist path creates one Python object per vertex and was the
    kernel's dominant, GC-contended cost at millions of rows.
    """
    import pyarrow as pa

    from ..functions.arrowpad import list_array_to_padded

    out_pa_schema = pa.schema(
        [
            ("feature_id", pa.int64()),
            ("fcode", pa.string()),
            ("errtype", pa.string()),
            ("magnitude_mm", pa.int64()),
            ("geom_kind", pa.string()),
        ]
    )

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            X, V = list_array_to_padded(batch.column("xs"))
            Y, _ = list_array_to_padded(batch.column("ys"))
            fid = batch.column("feature_id").to_numpy(zero_copy_only=False)
            fcode_arr = batch.column("fcode")
            geom = batch.column("geom_type").to_numpy(zero_copy_only=False)
            nverts = V.sum(axis=1)
            # degenerate features (no segments / no ring) emit nothing here;
            # they are ingest-report material (extract.main.c bad-data files)
            is_area = (geom == 3) & (nverts >= 3)
            is_line = (geom == 2) & (nverts >= 2)

            out_rows = []

            def emit(mask, errtype, magnitude_mm, kind):
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    return
                k = len(idx)
                out_rows.append(
                    pa.RecordBatch.from_arrays(
                        [
                            pa.array(fid[idx], type=pa.int64()),
                            fcode_arr.take(pa.array(idx)),
                            pa.array([errtype] * k, type=pa.string()),
                            pa.array(magnitude_mm[idx], type=pa.int64()),
                            pa.array([kind] * k, type=pa.string()),
                        ],
                        schema=out_pa_schema,
                    )
                )

            # open-path stats for lines
            l_total, l_min, l_max = _seq_edge_stats(X, Y, V, closed=False)
            emit(is_line & (l_min < tol.seglen_m) & (l_min > 0), "SEGLEN",
                 _trunc_mm(l_min), "LN")
            emit(is_line & (l_total < tol.shortfeat_m), "SHORTFEAT",
                 _trunc_mm(l_total), "LN")
            emit(is_line & (l_total > tol.longfeat_m), "LONGFEAT",
                 _trunc_mm(l_total), "LN")

            # closed-ring stats for areas
            a_total, a_min, _ = _seq_edge_stats(X, Y, V, closed=True)
            area = _seq_area_m2(X, Y, V)
            emit(is_area & (area < tol.smallarea_m2), "SMALLAREA",
                 _trunc_mm(area), "PT")
            emit(is_area & (a_total < tol.perimlen_m), "PERIMLEN",
                 _trunc_mm(a_total), "PT")
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = area / (a_total * a_total)
            emit(is_area & (ratio < tol.sliver_ratio), "SLIVER",
                 _trunc_mm(ratio * 1000.0), "PT")

            # composition checks
            vd = _v_dups(X, Y, V)
            emit(vd > 0, "V_DUPS", vd * 1000, "PT")
            loops = _self_intersects(X, Y, V)
            emit(is_line & loops, "LOOPS", np.zeros(len(fid), dtype=np.int64), "PT")

            # explicit rings (geom_type 4): last vertex must equal the first
            # (AREAUNCLOSED; GAIT notclosed flag, share_linux.h:728)
            is_ring = (geom == 4) & (nverts >= 3)
            if is_ring.any():
                rows_i = np.arange(X.shape[0])
                last_i = np.maximum(nverts - 1, 0)
                unclosed = is_ring & (
                    (X[rows_i, last_i] != X[:, 0]) | (Y[rows_i, last_i] != Y[:, 0])
                )
                emit(unclosed, "AREAUNCLOSED",
                     np.zeros(len(fid), dtype=np.int64), "PT")

            yield from out_rows

    return features.select("feature_id", "fcode", "geom_type", "xs", "ys").mapInArrow(
        run, schema=CHECK_OUT_SCHEMA
    )
