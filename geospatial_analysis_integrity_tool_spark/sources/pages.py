"""Common-Crawl-style pages source + batched extractor (input_hint contract).

Input table shape (BASELINE.json input_hint):
    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

* ``synth_pages`` builds a deterministic pages DataFrame: every column is a
  pure function of the row index (FIXTURES.md §1) — html embeds 0..4 geocoded
  feature records plus boilerplate, and ``text`` holds the canonical extracted
  text the extractor must reproduce **byte-identically per url**.
* ``extract_text`` / ``extract_features`` are Arrow-batched pandas kernels
  (vectorized pandas .str ops — no per-row Python UDFs): html -> text, and
  html -> geocoded feature rows (url, ordinal, fcode, lon, lat).  They are the
  engine's stage-1 "shapefile import" analogue (reference: shape_import.c
  geometry+attribute ingest, re-sourced from web pages per the graft).

The per-row invariant `extract_text(html) == text` is pytest-gated
(tests/test_pages.py), mirroring BASELINE.md §2 "byte-identical extracted
text per url".
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_WORDS = (
    "terrain feature survey cell boundary ridge valley stream contour datum "
    "meridian parallel sector quadrant marker station azimuth elevation grid "
    "transect polygon vertex attribute code domain schema check region tile"
).split()
_LANGS = ("en", "fr", "de", "es")
_FCODES = ("AL015", "GB005", "BH140", "AP030", "FA000")

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _page_batch(idx: np.ndarray, n_total: int = 0) -> pd.DataFrame:
    """Vectorized page synthesis for an array of row indexes (seeded by index,
    not by RNG state, so any partitioning yields identical rows).

    ``n_total`` is the corpus size; when > 0 every page carries 0..3
    deterministic outlinks to other pages (the web link graph for the
    linkgraph ops).  Links live outside <p> bodies and geo spans, so the
    extracted-text and feature contracts are unchanged."""
    n = len(idx)
    # --- text: 3 sentences of index-derived words ---------------------------
    w = len(_WORDS)
    parts = []
    for s in range(3):
        k1 = (idx * 7919 + s * 104729) % w
        k2 = (idx * 104717 + s * 7907) % w
        k3 = (idx * 31 + s * 17) % w
        parts.append(
            pd.Series([_WORDS[a] for a in k1])
            + " "
            + pd.Series([_WORDS[b] for b in k2])
            + " "
            + pd.Series([_WORDS[c] for c in k3])
            + " s"
            + pd.Series((idx % 97).astype(str))
        )
    text = parts[0] + "\n" + parts[1] + "\n" + parts[2]

    # --- embedded geocoded features (0..4 per page) -------------------------
    nfeat = (idx * 13) % 5
    spans = pd.Series([""] * n)
    for f in range(4):
        has = nfeat > f
        lon = ((idx * 733 + f * 997) % 7200) / 20.0 - 180.0
        lat = ((idx * 881 + f * 1009) % 2400) / 20.0 - 60.0
        fc = [(int(i) * 11 + f) % len(_FCODES) for i in idx]
        span = (
            '<span class="geo" data-fcode="'
            + pd.Series([_FCODES[c] for c in fc])
            + '" data-coords="'
            + pd.Series(np.round(lon, 2).astype(str))
            + ","
            + pd.Series(np.round(lat, 2).astype(str))
            + '"></span>'
        )
        spans = spans + span.where(has, "")

    # --- outlinks: page i links to (i*2017 + j*3571) % n_total, j < (i*7)%4 -
    links = pd.Series([""] * n)
    if n_total > 0:
        nlink = (idx * 7) % 4
        for j in range(3):
            has = nlink > j
            tgt = (idx * 2017 + j * 3571) % n_total
            a = (
                '<a class="out" href="https://example.org/'
                + pd.Series([_LANGS[int(t) % 4] for t in tgt])
                + "/page/"
                + pd.Series(tgt.astype(str))
                + '">ref</a>'
            )
            links = links + a.where(has, "")

    # --- html: boilerplate + <p> paragraphs + spans -------------------------
    p_html = (
        "<p>" + parts[0] + "</p><p>" + parts[1] + "</p><p>" + parts[2] + "</p>"
    )
    html = (
        "<html><head><title>page "
        + pd.Series(idx.astype(str))
        + '</title><meta charset="utf-8"></head><body><nav>boilerplate nav</nav>'
        + p_html
        + spans
        + links
        + "<footer>boilerplate footer</footer></body></html>"
    )

    url = (
        "https://example.org/"
        + pd.Series([_LANGS[int(i) % 4] for i in idx])
        + "/page/"
        + pd.Series(idx.astype(str))
    )
    ts = pd.Timestamp("2024-01-01T00:00:00") + pd.to_timedelta(idx * 137, unit="s")
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": ts,
            "html": html.str.encode("utf-8"),
            "text": text,
            "lang": [_LANGS[int(i) % 4] for i in idx],
        }
    )


def synth_pages(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic pages table of n rows (pure function of row index)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _page_batch(pdf["id"].to_numpy(), n_total=n)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# extractors (batched; the per-url byte-identity contract)
# ---------------------------------------------------------------------------

_P_RE = r"<p>(.*?)</p>"
_SPAN_RE = (
    r'<span class="geo" data-fcode="([A-Z0-9]+)" data-coords="([0-9.\-]+),([0-9.\-]+)"></span>'
)


def extract_text_kernel(html: pd.Series) -> pd.Series:
    """bytes html -> canonical text: <p> bodies joined by newline."""
    s = html.map(lambda b: b.decode("utf-8"))  # arrow binary -> str (C loop)
    return s.str.findall(_P_RE).str.join("\n")


def extract_text(pages: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"url": pdf["url"], "extracted": extract_text_kernel(pdf["html"])}
            )

    return pages.select("url", "html").mapInPandas(run, schema="url string, extracted string")


def extract_features(pages: DataFrame) -> DataFrame:
    """pages -> geocoded feature rows (url, ordinal, fcode, lon, lat)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf["html"].map(lambda b: b.decode("utf-8"))
            found = s.str.extractall(_SPAN_RE)
            if len(found) == 0:
                continue
            found = found.reset_index()
            out = pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy()[found["level_0"].to_numpy()],
                    "ordinal": found["match"].astype("int64"),
                    "fcode": found[0],
                    "lon": found[1].astype("float64"),
                    "lat": found[2].astype("float64"),
                }
            )
            yield out

    return pages.select("url", "html").mapInPandas(
        run, schema="url string, ordinal long, fcode string, lon double, lat double"
    )


_A_RE = r'<a class="out" href="([^"]+)">'


def extract_outlinks(pages: DataFrame) -> DataFrame:
    """pages -> outlink edges (src_url, ordinal, dst_url).

    Same batched-extractall shape as extract_features: one Arrow hop, no
    per-row Python, no shuffle — the edge list streams out of the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf["html"].map(lambda b: b.decode("utf-8"))
            found = s.str.extractall(_A_RE)
            if len(found) == 0:
                continue
            found = found.reset_index()
            yield pd.DataFrame(
                {
                    "src_url": pdf["url"].to_numpy()[found["level_0"].to_numpy()],
                    "ordinal": found["match"].astype("int64"),
                    "dst_url": found[0],
                }
            )

    return pages.select("url", "html").mapInPandas(
        run, schema="src_url string, ordinal long, dst_url string"
    )
