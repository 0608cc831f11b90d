"""Scale-path dedup operators: DF-capped Jaccard and hyperplane-LSH
embedding near-dup (the round-2 replacements for the quadratic shingle join
and the driver-side corpus broadcast)."""

from __future__ import annotations

import inspect

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_near_dup_lsh_no_driver_collect():
    """The LSH path must never materialize the corpus on the driver."""
    from geospatial_analysis_integrity_tool_spark.operators import ann

    src = inspect.getsource(ann.near_dup_pairs_lsh)
    assert "toPandas" not in src and "collect(" not in src


def test_near_dup_lsh_finds_planted_pairs(spark):
    from geospatial_analysis_integrity_tool_spark.operators.ann import (
        near_dup_pairs_exact,
        near_dup_pairs_lsh,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 64)).astype(np.float32)
    rows = [(i, [float(v) for v in base[i]]) for i in range(40)]
    # planted near-dups: tiny perturbation of vectors 0..4
    for i in range(5):
        v = base[i] + rng.normal(scale=0.01, size=64).astype(np.float32)
        rows.append((100 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in near_dup_pairs_lsh(emb, threshold=0.9).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in near_dup_pairs_exact(emb, threshold=0.9).collect()
    }
    assert {(i, 100 + i) for i in range(5)} <= got
    assert got <= exact  # LSH reports a subset of the exact pair set


def test_jaccard_df_cap_drops_hot_shingle_pairs(spark):
    """Docs sharing ONLY a hot shingle (df > cap) produce no candidate pair;
    docs sharing rare shingles still get exact Jaccard."""
    from geospatial_analysis_integrity_tool_spark.queries import textops

    hot = "alpha beta gamma"  # one 3-gram shared by 30 docs
    docs = []
    for i in range(30):
        docs.append((i, f"alpha beta gamma filler{i} unique{i} token{i}"))
    docs.append((100, "red green blue yellow purple"))
    docs.append((101, "red green blue yellow orange"))
    spark.createDataFrame(docs, "doc_id long, text string").createOrReplaceTempView(
        "documents_hot"
    )
    sh = (
        spark.table("documents_hot")
        .select("doc_id", F.expr(textops._TOKS_SPARK).alias("toks"))
        .select(
            "doc_id", F.explode(F.expr(textops._SHINGLES_FROM_TOKS)).alias("shingle")
        )
        .distinct()
    )
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    hot_df = dfreq.filter(F.col("shingle") == hot).first()["df"]
    assert hot_df == 30 > textops.SHINGLE_DF_CAP
    rare = sh.join(
        dfreq.filter(F.col("df") <= textops.SHINGLE_DF_CAP).select("shingle"),
        "shingle",
    )
    cand = (
        rare.selectExpr("doc_id AS a", "shingle")
        .join(rare.selectExpr("doc_id AS b", "shingle"), "shingle")
        .filter("a < b")
        .select("a", "b")
        .distinct()
        .collect()
    )
    pairs = {(r.a, r.b) for r in cand}
    assert pairs == {(100, 101)}  # hot-shingle-only pairs are gone
