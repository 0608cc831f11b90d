"""Pages source + extractor: the per-row byte-identity invariant
(BASELINE.json input_hint / BASELINE.md §2) and extraction determinism."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pages_schema_and_determinism(spark):
    from geospatial_analysis_integrity_tool_spark.sources.pages import synth_pages

    p = synth_pages(spark, 200)
    assert [f.name for f in p.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    a = {r.url: r.text for r in p.collect()}
    # different partitioning -> identical rows (pure function of index)
    b = {r.url: r.text for r in synth_pages(spark, 200, partitions=3).collect()}
    assert a == b and len(a) == 200


def test_extracted_text_byte_identical_per_url(spark):
    """THE per-row invariant: extract(html) == text, byte for byte, per url."""
    from geospatial_analysis_integrity_tool_spark.sources.pages import (
        extract_text,
        synth_pages,
    )

    p = synth_pages(spark, 500)
    joined = extract_text(p).join(p.select("url", "text"), "url")
    mismatches = joined.filter(
        F.col("extracted").cast("binary") != F.col("text").cast("binary")
    ).count()
    assert mismatches == 0
    assert joined.count() == 500


def test_extract_features_deterministic_and_bounded(spark):
    from geospatial_analysis_integrity_tool_spark.sources.pages import (
        extract_features,
        synth_pages,
    )

    p = synth_pages(spark, 300)
    f = extract_features(p)
    rows = f.collect()
    # 0..4 features per page, mean 2
    per_url: dict[str, int] = {}
    for r in rows:
        per_url[r.url] = per_url.get(r.url, 0) + 1
        assert -180.0 <= r.lon < 180.0 and -60.0 <= r.lat < 60.0
        assert r.fcode in {"AL015", "GB005", "BH140", "AP030", "FA000"}
    assert max(per_url.values()) <= 4
    # determinism across partitioning
    rows2 = extract_features(synth_pages(spark, 300, partitions=5)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_pages_to_cells_pipeline(spark):
    """pages -> extract -> encode: the north star stage-1/2 chain."""
    from geospatial_analysis_integrity_tool_spark.operators.encode import encode_cells
    from geospatial_analysis_integrity_tool_spark.sources.pages import (
        extract_features,
        synth_pages,
    )

    feats = extract_features(synth_pages(spark, 100))
    enc = encode_cells(feats, hex_res=(7, 9), s2_levels=(10, 12))
    rows = enc.collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert r.hex_r7 != 0 and r.s2_l10 != 0
    # tile assignment invariant across reruns
    rows2 = encode_cells(
        extract_features(synth_pages(spark, 100, partitions=7)),
        hex_res=(7, 9),
        s2_levels=(10, 12),
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
