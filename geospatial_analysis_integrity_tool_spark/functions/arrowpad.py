"""Zero-object-churn decode of Arrow list columns into padded numpy matrices.

``pandas`` decoding of ``array<double>`` columns materializes one Python
object per row (then per-row padding loops) — measured as the dominant cost
and a cross-worker GC contention source in the check kernels.  This module
goes straight from the Arrow ListArray buffers (values + offsets) to a padded
(rows x max_len) float64 matrix with pure vectorized indexing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_array_to_padded(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """ListArray<float64-ish> -> (X[n, m] padded with NaN, valid[n, m])."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # flatten() drops per-slot nulls correctly for our non-null data
    offsets = np.asarray(arr.offsets)
    values = np.asarray(arr.values, dtype=np.float64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n = len(lens)
    m = int(lens.max()) if n else 0
    X = np.full((n, m), np.nan)
    if m:
        start, end = int(offsets[0]), int(offsets[-1])
        vals = values[start:end]
        row = np.repeat(np.arange(n), lens)
        pos = np.arange(len(vals)) - np.repeat(offsets[:-1] - start, lens)
        X[row, pos] = vals
    V = (np.arange(m)[None, :] < lens[:, None]) if m else np.zeros((n, 0), dtype=bool)
    return X, V
