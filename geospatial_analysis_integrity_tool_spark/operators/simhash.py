"""SimHash near-duplicate detection (64-bit, token-weighted).

Signature: md5 of each token -> 64 bits; per-document bit-majority vote
(weight 1 per occurrence).  Candidate pairs via 4x16-bit band buckets
(hamming distance <= 3 guarantees a shared band; we verify candidates with
the exact hamming distance).  Deterministic: md5 only, no RNG.

Per-batch vectorization: unique tokens are hashed once (hashlib over the
deduplicated vocabulary, typically << corpus size), then document bit
accumulation is numpy matrix arithmetic.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HAMMING_MAX = 6
N_BANDS = 4


def _token_bits(vocab: list[str]) -> np.ndarray:
    """(n_vocab, 64) in {-1, +1} from md5 of each token."""
    out = np.empty((len(vocab), 64), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(vocab):
        h = np.uint64(
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        )
        bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
        out[i] = bits * 2 - 1
    return out


def simhash_kernel(texts: pd.Series) -> np.ndarray:
    """Series of str -> uint64 simhash per document."""
    token_lists = texts.str.split()
    vocab: dict[str, int] = {}
    for toks in token_lists:
        for t in toks:
            vocab.setdefault(t, len(vocab))
    tb = _token_bits(list(vocab))
    sigs = np.empty(len(texts), dtype=np.uint64)
    for i, toks in enumerate(token_lists):
        idx = np.fromiter((vocab[t] for t in toks), dtype=np.int64, count=len(toks))
        acc = tb[idx].sum(axis=0)
        bits = (acc > 0).astype(np.uint64)
        sigs[i] = np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64))
    return sigs


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sig = simhash_kernel(pdf[text_col])
            yield pd.DataFrame(
                # reinterpret the 64-bit pattern as signed (top bit may be set)
                {"doc_id": pdf[id_col].to_numpy(), "simhash": sig.view(np.int64)}
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema="doc_id long, simhash long")


def simhash_near_dups(
    docs: DataFrame, hamming_max: int = HAMMING_MAX
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with hamming(sig_a, sig_b) <= max.

    Banded candidate generation: equal 16-bit band -> candidate; exact
    hamming verified JVM-side with bit_count (no UDF in the join path).
    """
    sigs = simhash_signatures(docs)
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.lit(i) for i in range(N_BANDS)])
        ).alias("band"),
    ).withColumn(
        "band_val",
        F.expr("CAST(shiftright(simhash, CAST(band * 16 AS INT)) & 65535 AS INT)"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "band_val"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "band_val"
    )
    pairs = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        pairs.withColumn("hamming", F.expr("bit_count(sig_a ^ sig_b)"))
        .filter(F.col("hamming") <= hamming_max)
        .select("doc_a", "doc_b", F.col("hamming").cast("bigint").alias("hamming"))
    )
