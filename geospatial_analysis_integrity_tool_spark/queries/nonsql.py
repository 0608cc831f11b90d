"""Pages-pipeline gates + the one genuinely non-SQL-expressible query.

* pages_extract_text — GATED: synthetic Common-Crawl pages -> batched
  extractor -> (url, extracted text); the oracle REBUILDS the canonical text
  closed-form from the row-index arithmetic (sources/pages._page_batch), so
  the driver's value hash enforces the north-rule invariant "byte-identical
  extracted text per url" end-to-end (synthesis -> html assembly -> regex
  extraction), not just via pytest.
* pages_extract_features — GATED: html -> geocoded feature rows.  Coordinates
  are compared as exact centi-degree integers (the synthesized coordinates
  are multiples of 0.05 deg, so round(lon*100) is float-hazard-free in both
  engines), derived closed-form by the oracle from the same index arithmetic.
* geo_encode_cells — rows-only: H3-style res-7..12 + S2 level-10..16 encode
  of feature points (the north-rule tiling contract; hierarchy/determinism
  verified structurally in tests/test_cells.py).  The curve arithmetic
  (cube-face projection + hierarchical child indexing) is the one surface
  with no reasonable SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.encode import encode_cells
from ..sources.pages import extract_features, extract_text, synth_pages
from ..sources.synthetic import register_geo_views


def q_encode_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    pts = spark.table("geo_points").select("point_id", "lon", "lat")
    enc = encode_cells(pts, hex_res=(7, 9, 12), s2_levels=(10, 13, 16))
    return enc.select(
        "point_id", "hex_r7", "hex_r9", "hex_r12", "s2_l10", "s2_l13", "s2_l16"
    )


def _n_pages(sf_dir: str) -> int:
    # page count scales with the sf directory (deterministic per sf)
    return 2000 if "0.1" in sf_dir else (500 if "0.01" in sf_dir else 100)


def q_pages_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(synth_pages(spark, _n_pages(sf_dir)))
    return feats.select(
        "url",
        "ordinal",
        "fcode",
        # parsed floats are within ~1e-13 of an exact multiple of 0.01 deg,
        # so ROUND to centi-degrees is stable; floor(x*1e6) would not be.
        F.expr("CAST(ROUND(lon * 100.0) AS BIGINT)").alias("lon_cdeg"),
        F.expr("CAST(ROUND(lat * 100.0) AS BIGINT)").alias("lat_cdeg"),
    )


def q_pages_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_text(synth_pages(spark, _n_pages(sf_dir)))


# Closed-form re-derivations of sources/pages._page_batch (index arithmetic).
_WORDS_SQL = (
    "['terrain','feature','survey','cell','boundary','ridge','valley','stream',"
    "'contour','datum','meridian','parallel','sector','quadrant','marker',"
    "'station','azimuth','elevation','grid','transect','polygon','vertex',"
    "'attribute','code','domain','schema','check','region','tile']"
)
_LANGS_SQL = "['en','fr','de','es']"
_FCODES_SQL = "['AL015','GB005','BH140','AP030','FA000']"
_URL_SQL = (
    "'https://example.org/' || "
    f"{_LANGS_SQL}[CAST(i % 4 AS INT) + 1] || '/page/' || i"
)


def _oracle_pages_features(n: int) -> str:
    return f"""
WITH ids AS (SELECT unnest(range(0, {n})) AS i),
fs AS (SELECT unnest(range(0, 4)) AS f)
SELECT {_URL_SQL} AS url,
       CAST(f AS BIGINT) AS ordinal,
       {_FCODES_SQL}[CAST((i * 11 + f) % 5 AS INT) + 1] AS fcode,
       CAST((i * 733 + f * 997) % 7200 * 5 - 18000 AS BIGINT) AS lon_cdeg,
       CAST((i * 881 + f * 1009) % 2400 * 5 - 6000 AS BIGINT) AS lat_cdeg
FROM ids, fs WHERE f < (i * 13) % 5
"""


def _oracle_pages_text(n: int) -> str:
    word = lambda expr: f"{_WORDS_SQL}[CAST(({expr}) % 29 AS INT) + 1]"  # noqa: E731
    line = (
        f"{word('i * 7919 + s * 104729')} || ' ' || "
        f"{word('i * 104717 + s * 7907')} || ' ' || "
        f"{word('i * 31 + s * 17')} || ' s' || (i % 97)"
    )
    return f"""
WITH ids AS (SELECT unnest(range(0, {n})) AS i),
ss AS (SELECT unnest(range(0, 3)) AS s),
lines AS (SELECT i, s, {line} AS line FROM ids, ss)
SELECT {_URL_SQL} AS url,
       string_agg(line, chr(10) ORDER BY s) AS extracted
FROM lines GROUP BY i
"""


def q_pages_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus rollup over the batched extractor output.

    The web-pipeline "how much text per language" report: language comes from
    the url path (the synthetic corpus encodes it there, mirroring CC-style
    path conventions), volume from the extracted text.  Runs as one
    mapInPandas extract + a tiny groupBy — the aggregation is on the reduced
    (url, length) projection, so at 10^12 pages the shuffle carries one small
    row per page, not the text."""
    txt = extract_text(synth_pages(spark, _n_pages(sf_dir)))
    return (
        txt.select(
            F.expr("split_part(url, '/', 4)").alias("lang"),
            F.expr("CAST(length(extracted) AS BIGINT)").alias("_len"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum("_len").alias("total_chars"),
            F.min("_len").alias("min_chars"),
            F.max("_len").alias("max_chars"),
        )
    )


def _oracle_pages_lang_stats(n: int) -> str:
    return f"""
WITH txt AS ({_oracle_pages_text(n)})
SELECT split_part(url, '/', 4) AS lang,
       COUNT(*) AS n_pages,
       CAST(SUM(length(extracted)) AS BIGINT) AS total_chars,
       CAST(MIN(length(extracted)) AS BIGINT) AS min_chars,
       CAST(MAX(length(extracted)) AS BIGINT) AS max_chars
FROM txt GROUP BY 1
"""


QUERIES = {
    "geo_encode_cells": q_encode_cells,
    "pages_extract_features": q_pages_extract,
    "pages_extract_text": q_pages_extract_text,
    "pages_lang_stats": q_pages_lang_stats,
}

# the correctness gate runs at sf0.01 -> n = 500 (matches _n_pages)
ORACLES: dict[str, str] = {
    "pages_extract_features": _oracle_pages_features(500),
    "pages_extract_text": _oracle_pages_text(500),
    "pages_lang_stats": _oracle_pages_lang_stats(500),
}
