"""Gated query sourced from REAL WARC shard fixtures (sources/warc.py).

The fixture writer renders the synthetic corpus with the SAME vectorized
kernel the pages table uses (sources/pages._page_batch — byte-identical
html per url), packs it into WARC/1.1 shards (8 files, round-robin by page
index), and the engine reads the shards back through the DISTRIBUTED
container reader (binaryFile + offset-walking kernel), re-extracts the
canonical text from each payload, and reports (url, capture epoch, text
md5).

The DuckDB oracle never sees the files: it re-derives the text closed-form
from the row-index arithmetic and the capture time as epoch + i*137.  Any
container defect — wrong Content-Length framing, header corruption, payload
truncation, shard assignment loss — changes a hash or a row count and fails
the gate.  This is the webtext twin of the shp/DTED round-trip gates.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import fixture_dir
from ..sources.pages import _page_batch, extract_text_kernel
from ..sources.warc import read_warc, write_warc
from .nonsql import _n_pages, _oracle_pages_text

_N_SHARDS = 8
_EPOCH_2024 = 1704067200  # warc_ts origin (2024-01-01T00:00:00Z)


def _ensure_warc_fixture(n: int) -> str:
    d = fixture_dir(f"warc_n{n}")
    paths = [os.path.join(d, f"shard-{s:02d}.warc") for s in range(_N_SHARDS)]
    if all(os.path.exists(p) for p in paths):
        return d
    pdf = _page_batch(np.arange(n), n_total=n)
    dates = pdf["warc_ts"].dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    for s, p in enumerate(paths):
        recs = [
            (pdf["url"][i], dates[i], pdf["html"][i])
            for i in range(n)
            if i % _N_SHARDS == s
        ]
        write_warc(p, recs)
    return d


def q_warc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _n_pages(sf_dir)
    d = _ensure_warc_fixture(n)
    recs = read_warc(spark, os.path.join(d, "*.warc"))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["target_uri"],
                    "warc_date": pdf["warc_date"],
                    "extracted": extract_text_kernel(pdf["payload"]),
                }
            )

    txt = recs.mapInPandas(
        run, schema="url string, warc_date string, extracted string"
    )
    return txt.select(
        "url",
        F.expr(
            "unix_timestamp(to_timestamp(warc_date,"
            " \"yyyy-MM-dd'T'HH:mm:ss'Z'\"))"
        ).alias("ts_s"),
        F.md5("extracted").alias("text_md5"),
    )


def _oracle_warc_scan(n: int) -> str:
    return f"""
WITH txt AS ({_oracle_pages_text(n)})
SELECT url,
       {_EPOCH_2024} + CAST(split_part(url, '/', 6) AS BIGINT) * 137 AS ts_s,
       md5(extracted) AS text_md5
FROM txt
"""


QUERIES = {"warc_scan": q_warc_scan}
ORACLES: dict[str, str] = {"warc_scan": _oracle_warc_scan(500)}
