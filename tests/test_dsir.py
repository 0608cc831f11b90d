"""DSIR importance-resampling selection (queries/dsirq.py)."""

from __future__ import annotations

import math


def test_log2fp_is_monotone_and_close():
    """The fixed-point log2 surrogate: strictly monotone, max error < 0.09 bits."""
    def log2fp(n: int) -> int:
        m = n.bit_length() - 1
        return m * 65536 + ((n - (1 << m)) * 65536) // (1 << m)

    prev = None
    for n in list(range(1, 4096)) + [10**6, 10**9, 10**12]:
        v = log2fp(n)
        if prev is not None and n <= 4096:
            assert v >= prev  # monotone (non-strict only at fp granularity)
        prev = v
        assert abs(v / 65536 - math.log2(n)) < 0.09

def test_lm_perplexity_invariants(spark):
    """Bigram-LM scores: one row per doc with >= 2 tokens, positive NLL,
    ppl = truncating mean of per-bigram bits."""
    from pyspark.sql import functions as F

    from geospatial_analysis_integrity_tool_spark.queries.dsirq import (
        q_docs_lm_perplexity,
    )

    out = q_docs_lm_perplexity(spark, "/root/testdata/sf0.01")
    rows = out.collect()
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n_multi = docs.filter(
        F.expr("size(filter(split(text, '\\\\s+'), t -> t <> '')) >= 2")
    ).count()
    assert len(rows) == n_multi
    for r in rows:
        # add-1 smoothing guarantees c2+1 <= c1+V, so every bigram's
        # fixed-point bit cost is positive
        assert r["nll_fp"] > 0
        assert r["n_bigrams"] >= 1
        assert r["ppl_fp"] == r["nll_fp"] // r["n_bigrams"]


def test_dsir_selects_from_raw_pool_only(spark):
    from geospatial_analysis_integrity_tool_spark.queries.dsirq import (
        SELECT_K,
        TARGET_SOURCES,
        q_docs_dsir_select,
    )

    sel = q_docs_dsir_select(spark, "/root/testdata/sf0.01")
    rows = sel.collect()
    assert len(rows) == SELECT_K
    # ranks are dense 1..K and the weight spread is real (not jitter-only)
    assert sorted(r["rank"] for r in rows) == list(range(1, SELECT_K + 1))
    logws = [r["logw_fp"] for r in rows]
    assert max(logws) - min(logws) > 65536 // 4  # > 0.25 bits of spread
    # every selected doc comes from the raw (non-target) pool
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    tgt_ids = {
        r["doc_id"]
        for r in docs.filter(docs.source.isin(*TARGET_SOURCES))
        .select("doc_id")
        .collect()
    }
    assert all(r["doc_id"] not in tgt_ids for r in rows)
