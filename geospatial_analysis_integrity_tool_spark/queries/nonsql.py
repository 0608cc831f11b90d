"""Rows-only queries (no SQL oracle — genuinely non-SQL-expressible ops).

The driver records a weaker rows-only check for these; their semantics are
pytest-gated instead (tests/test_cells.py, tests/test_pages.py):

* geo_encode_cells — H3-style res-7..12 + S2 level-10..16 encode of the
  feature points (the north-rule tiling contract; hierarchy/determinism
  verified structurally in pytest).
* pages_extract_features — synthetic Common-Crawl pages -> batched extractor
  -> geocoded features (byte-identity invariant pytest-gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.encode import encode_cells
from ..sources.pages import extract_features, synth_pages
from ..sources.synthetic import register_geo_views


def q_encode_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    pts = spark.table("geo_points").select("point_id", "lon", "lat")
    enc = encode_cells(pts, hex_res=(7, 9, 12), s2_levels=(10, 13, 16))
    return enc.select(
        "point_id", "hex_r7", "hex_r9", "hex_r12", "s2_l10", "s2_l13", "s2_l16"
    )


def q_pages_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # page count scales with the sf directory (deterministic per sf)
    n = 2000 if "0.1" in sf_dir else (500 if "0.01" in sf_dir else 100)
    feats = extract_features(synth_pages(spark, n))
    return feats.select(
        "url",
        "ordinal",
        "fcode",
        F.expr("CAST(floor(lon * 1000000.0) AS BIGINT)").alias("lon_udeg"),
        F.expr("CAST(floor(lat * 1000000.0) AS BIGINT)").alias("lat_udeg"),
    )


QUERIES = {
    "geo_encode_cells": q_encode_cells,
    "pages_extract_features": q_pages_extract,
}

ORACLES: dict[str, str] = {}
