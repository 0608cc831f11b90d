"""SemDeDup cluster-size cap (queries/vectorq.semantic_dedup_pairs).

The per-cluster all-pairs kernel is quadratic in cluster size, so clusters
above SEM_CLUSTER_CAP are split by a second-level banded hyperplane LSH
before the exact verify kernel runs.  These tests plant ONE mega-cluster
(every row assigned k=0) and assert that

* candidate-pair work is bounded: sum over band-buckets of C(bucket, 2)
  stays far below C(n, 2) — linear-ish in n for a spread-out cluster;
* recall on planted exact duplicates is 1.0 (identical vectors produce
  identical signatures, so every band matches deterministically);
* no false positives: the exact integer cosine test verifies every
  candidate, so reported pairs satisfy cos >= 0.9 regardless of banding;
* the split path agrees with the exact path on the pairs the bands admit
  (subset relation + exact equality on planted dups).
"""

from __future__ import annotations

import numpy as np
import pytest


def _mega_cluster_rows(n: int, n_dups: int, dim: int = 64):
    """Deterministic spread-out vectors + planted exact-duplicate pairs.

    Base vectors are multiplicative-hash pseudo-noise in [-1, 1) — pairwise
    cosines hover near 0, far below the 0.9 threshold.  Rows
    n..n+n_dups-1 are exact copies of rows 0..n_dups-1 (vec_id shifted by
    100000), so the expected pair set is exactly those n_dups (i, i+100000)
    pairs.
    """
    rng = np.random.RandomState(7)
    V = rng.uniform(-1.0, 1.0, size=(n, dim))
    rows = []
    for i in range(n):
        rows.append((0, i, [float(x) for x in V[i]]))
    for i in range(n_dups):
        rows.append((0, i + 100000, rows[i][2]))
    return rows


@pytest.fixture(scope="module")
def mega(spark):
    rows = _mega_cluster_rows(1600, 25)
    df = spark.createDataFrame(rows, "k long, vec_id long, embedding array<float>")
    return df, rows


def test_split_path_bounds_candidate_pairs(mega):
    from geospatial_analysis_integrity_tool_spark.operators.ann import (
        LSH_BAND_BITS,
        LSH_BANDS,
        N_HYPERPLANES,
        _QUANT,
        _hyperplane_signs,
    )

    _, rows = mega
    n = len(rows)
    V = np.array([r[2] for r in rows], dtype=np.float64)
    S = np.array(_hyperplane_signs(N_HYPERPLANES, 64), dtype=np.int64)
    Q = np.floor(V * _QUANT).astype(np.int64)
    bands = ((Q @ S.T) >= 0).astype(np.int64).reshape(n, LSH_BANDS, LSH_BAND_BITS)
    weights = np.array([1 << j for j in range(LSH_BAND_BITS)], dtype=np.int64)
    cand = 0
    for b in range(LSH_BANDS):
        keys = bands[:, b, :] @ weights
        _, counts = np.unique(keys, return_counts=True)
        cand += int((counts * (counts - 1) // 2).sum())
    # all-pairs would be C(1625, 2) = 1,319,500; the banded candidate count
    # must stay linear-ish: <= n * bound with a small constant bound.
    assert cand <= n * 40, cand
    assert cand < (n * (n - 1) // 2) / 8


def test_split_path_recall_and_exactness(mega, spark):
    from geospatial_analysis_integrity_tool_spark.queries.vectorq import (
        semantic_dedup_pairs,
    )

    df, rows = mega
    got = semantic_dedup_pairs(df, cap=256).toPandas()
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))
    planted = {(i, i + 100000) for i in range(25)}
    # recall 1.0 on exact duplicates: identical vectors share every band.
    assert planted <= got_pairs
    # no false positives: every reported pair passes the exact integer test.
    vecs = {r[1]: np.floor(np.array(r[2], dtype=np.float64) * 100).astype(np.int64) for r in rows}
    for a, b in got_pairs:
        dot = int(vecs[a] @ vecs[b])
        na = int(vecs[a] @ vecs[a])
        nb = int(vecs[b] @ vecs[b])
        assert dot > 0 and 100 * dot * dot >= 81 * na * nb, (a, b)
    assert (got["cluster_id"] == 0).all()
    # split-path pairs are a subset of the exact all-pairs result.
    exact = semantic_dedup_pairs(df, cap=10_000).toPandas()
    exact_pairs = set(zip(exact["vec_a"], exact["vec_b"]))
    assert got_pairs <= exact_pairs
    assert planted <= exact_pairs


def test_small_clusters_take_exact_path(mega, spark):
    """Below the cap the result is the full exact pair set (no banding loss)."""
    from geospatial_analysis_integrity_tool_spark.queries.vectorq import (
        semantic_dedup_pairs,
    )

    rows = _mega_cluster_rows(120, 6)
    df = spark.createDataFrame(rows, "k long, vec_id long, embedding array<float>")
    out = semantic_dedup_pairs(df, cap=1024).toPandas()
    assert {(i, i + 100000) for i in range(6)} <= set(zip(out["vec_a"], out["vec_b"]))
