"""Winnowing fingerprints (queries/winnowq.py): the SIGMOD-2003 guarantees."""

from __future__ import annotations


def test_winnow_coverage_guarantee(spark):
    """Any shared token run of >= W + k - 1 tokens yields a shared selected
    fingerprint — the defining winnowing property (Schleimer et al. §2)."""
    from geospatial_analysis_integrity_tool_spark.queries.winnowq import (
        WINNOW_W,
        winnow_fps,
    )

    # W + k - 1 = 4 + 3 - 1 = 6 shared tokens, embedded in unrelated text
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six seven"),
            (2, f"red green blue cyan {shared} magenta yellow black"),
            (3, "totally unrelated words without any overlap at all here"),
        ],
        "doc_id: bigint, text: string",
    )
    fps = winnow_fps(docs)
    rows = fps.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    assert by_doc[1] & by_doc[2], "shared 6-token run must share a fingerprint"
    # density: winnowing keeps ~2/(W+1) of shingles, never more than 1/window
    for d, hs in by_doc.items():
        assert len(hs) >= 1


def test_winnow_density_and_determinism(spark):
    """Selected density stays near 2/(W+1) on real docs; repeat runs agree."""
    from pyspark.sql import functions as F

    from geospatial_analysis_integrity_tool_spark.queries.winnowq import (
        WINNOW_W,
        winnow_fps,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fps = winnow_fps(docs)
    n_docs = docs.filter(
        F.expr("size(filter(split(text, '\\\\s+'), t -> t <> '')) >= 6")
    ).count()
    stats = fps.groupBy("doc_id").count().agg(
        F.count("*").alias("docs"), F.avg("count").alias("avg_fp")
    ).first()
    assert stats["docs"] == n_docs
    # shingles per doc ~ tokens-2; expected density 2/(W+1) = 0.4 of windows
    toks_avg = docs.select(
        F.avg(F.expr("size(filter(split(text, '\\\\s+'), t -> t <> ''))"))
    ).first()[0]
    density = stats["avg_fp"] / max(toks_avg - 2, 1)
    assert 0.1 < density < 0.8
    a = sorted(map(tuple, fps.collect()))
    b = sorted(map(tuple, winnow_fps(docs).collect()))
    assert a == b
