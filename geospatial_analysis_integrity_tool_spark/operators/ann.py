"""Approximate / brute-force nearest-neighbor search over embedding columns.

Spark-native shape:

* the small query side (or codebook) is collected once and **broadcast** as a
  numpy matrix;
* the big side streams through ``mapInPandas`` where each Arrow batch becomes a
  (batch x dim) float64 matrix and one BLAS matmul computes all cosines — the
  vectorized replacement for any per-row loop;
* per-batch partial top-k keeps only k rows per query per batch, then a global
  window (`row_number` over cos desc, id) finalizes ranks — the standard
  distributed top-k with map-side pruning, so the shuffle carries
  O(k * queries * partitions) rows, not O(n).

At 100 TB the same structure holds: the query/codebook side must fit in one
executor (broadcast), the corpus side never leaves its partitions until the
pruned candidates shuffle.  An IVF variant (cluster the corpus, search only the
probed cells) drops in by replacing the broadcast matrix with per-cell
codebooks; planned for a later round.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    return mat / norms


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (self excluded).

    Returns (query_id, neighbor_id, rank) with rank 1..k ordered by cosine
    descending, ties broken by neighbor id ascending.
    """
    spark = emb.sparkSession
    qpd = queries.select(id_col, vec_col).toPandas()
    q_ids = qpd[id_col].to_numpy()
    Q = _normalize(np.stack(qpd[vec_col].to_numpy()).astype(np.float64))
    bq = spark.sparkContext.broadcast((q_ids, Q))

    out_schema = "query_id long, neighbor_id long, cos double"

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_, Q_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            ids = pdf[id_col].to_numpy()
            S = X @ Q_.T  # (batch, nq)
            rows = []
            for j in range(S.shape[1]):
                col = S[:, j]
                mask = ids != q_ids_[j]
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) == 0:
                    continue
                # partial top-k within the batch (order by -cos, id)
                order = np.lexsort((ids[cand_idx], -col[cand_idx]))[:k]
                sel = cand_idx[order]
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(sel), q_ids_[j], dtype=np.int64),
                            "neighbor_id": ids[sel].astype(np.int64),
                            "cos": col[sel],
                        }
                    )
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)

    partial = emb.select(id_col, vec_col).mapInPandas(part, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


def cosine_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: the scale path for ANN.

    Deterministic codebook = the embeddings of the ``nlist`` lowest ids (no
    RNG, so results are stable across runs — a k-means codebook drops in
    without changing the plan shape).  Corpus vectors are assigned to their
    argmax-cosine centroid (one matmul per Arrow batch); each query probes its
    ``nprobe`` nearest centroids and ranks only vectors in those buckets.
    Same distributed shape as :func:`cosine_topk` — broadcast codebook +
    map-side partial top-k — but the probe side touches ~nprobe/nlist of the
    corpus, which is what survives at 10^10 vectors.
    """
    spark = emb.sparkSession
    cpd = (
        emb.orderBy(F.col(id_col).asc())
        .limit(nlist)
        .select(id_col, vec_col)
        .toPandas()
    )
    C = _normalize(np.stack(cpd[vec_col].to_numpy()).astype(np.float64))
    qpd = queries.select(id_col, vec_col).toPandas()
    q_ids = qpd[id_col].to_numpy()
    Q = _normalize(np.stack(qpd[vec_col].to_numpy()).astype(np.float64))
    # query -> probed buckets (driver-side, tiny)
    probe_sets = np.argsort(-(Q @ C.T), axis=1, kind="stable")[:, :nprobe]
    bq = spark.sparkContext.broadcast((q_ids, Q, C, probe_sets))

    out_schema = "query_id long, neighbor_id long, cos double"

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_, Q_, C_, probes_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            ids = pdf[id_col].to_numpy()
            buckets = np.argmax(X @ C_.T, axis=1)
            S = X @ Q_.T
            rows = []
            for j in range(S.shape[1]):
                allowed = np.isin(buckets, probes_[j]) & (ids != q_ids_[j])
                cand = np.nonzero(allowed)[0]
                if len(cand) == 0:
                    continue
                order = np.lexsort((ids[cand], -S[cand, j]))[:k]
                sel = cand[order]
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(sel), q_ids_[j], dtype=np.int64),
                            "neighbor_id": ids[sel].astype(np.int64),
                            "cos": S[sel, j],
                        }
                    )
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)

    partial = emb.select(id_col, vec_col).mapInPandas(part, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Unordered pairs with cosine >= threshold (embedding near-duplicates).

    Baseline path: the full corpus is broadcast as one normalized matrix (fine
    up to ~10M x 64 float32 = 2.5 GB executor memory at most; beyond that the
    LSH-bucketed variant partitions by hyperplane signature first).  Each batch
    matmuls against the broadcast matrix and emits only pairs (a < b) above
    threshold, so nothing quadratic ever materializes in the plan.
    """
    spark = emb.sparkSession
    apd = emb.select(id_col, vec_col).toPandas()
    all_ids = apd[id_col].to_numpy().astype(np.int64)
    M = _normalize(np.stack(apd[vec_col].to_numpy()).astype(np.float64))
    bm = spark.sparkContext.broadcast((all_ids, M))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids_, M_ = bm.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            ids = pdf[id_col].to_numpy().astype(np.int64)
            S = X @ M_.T  # (batch, n_all)
            bi, aj = np.nonzero(S >= threshold)
            if len(bi) == 0:
                continue
            ia = ids[bi]
            ib = all_ids_[aj]
            keep = ia < ib
            if not keep.any():
                continue
            yield pd.DataFrame({"id_a": ia[keep], "id_b": ib[keep]})

    return (
        emb.select(id_col, vec_col)
        .mapInPandas(part, schema="id_a long, id_b long")
        .dropDuplicates(["id_a", "id_b"])
    )
