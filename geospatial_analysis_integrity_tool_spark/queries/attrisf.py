"""ISF illegal-attribute-pair matrix at the reference's full structure.

GAIT compiles per-model N x N compatibility matrices over attribute-value
header codes — e.g. ``TDS4_ISF_Headers[225]`` with a matrix of
'n'/'e'/'g'/'w' cells (no-constraint / error / grave / warning),
tds_illegals.c:16-60, consumed in interface2.c.  The round-1 subset had 3
pairs; this check carries the REAL shape: a header vector + a dense matrix,
broadcast in long form, joined against each feature's (row, col) value-code
pair.

The matrix here is synthesized deterministically (matrix cells from a
residue formula) — the loader/check machinery is schema-complete, so a
transcribed production matrix drops in without any plan change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.synthetic import register_testdata_views

#: header codes (attribute=value atoms, TDS-flavored)
ISF_HEADERS = [
    "BH140:RIVER", "BH140:CANAL", "AP030:ROAD", "AP030:TRACK",
    "AL015:BUILDING", "AL015:RUIN", "AN010:RAILWAY", "AQ040:BRIDGE",
    "AT030:POWERLINE", "GB005:AIRPORT", "FA000:BOUNDARY", "AM010:DEPOT",
]


def isf_matrix() -> list[tuple[int, int, str]]:
    """Dense N x N cell codes in long form (i, j, code)."""
    out = []
    n = len(ISF_HEADERS)
    for i in range(n):
        for j in range(n):
            r = (i * 7 + j * 11) % 13
            code = "e" if r == 0 else "g" if r == 1 else "w" if r == 2 else "n"
            out.append((i, j, code))
    return out


#: feature -> (row header, col header) value-code indexes, derived from part
_FEAT_PAIR_SQL = """
SELECT p_partkey AS feature_id,
       CAST(p_partkey % 12 AS INT) AS hi,
       CAST((p_partkey * 5) % 12 AS INT) AS hj
FROM part
"""


def q_isf_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_testdata_views(spark, sf_dir)
    feats = spark.sql(_FEAT_PAIR_SQL)
    cells = spark.createDataFrame(isf_matrix(), "hi int, hj int, code string")
    headers = spark.createDataFrame(
        list(enumerate(ISF_HEADERS)), "idx int, header string"
    )
    return (
        feats.join(F.broadcast(cells), ["hi", "hj"])
        .filter(F.col("code") != "n")
        .join(
            F.broadcast(headers.selectExpr("idx AS hi", "header AS header_a")), "hi"
        )
        .join(
            F.broadcast(headers.selectExpr("idx AS hj", "header AS header_b")), "hj"
        )
        .select("feature_id", "header_a", "header_b", "code")
    )


def _matrix_values() -> str:
    rows = ", ".join(
        f"({i}, {j}, '{c}')" for i, j, c in isf_matrix() if c != "n"
    )
    return f"(VALUES {rows}) AS m(hi, hj, code)"


def _header_values() -> str:
    rows = ", ".join(f"({i}, '{h}')" for i, h in enumerate(ISF_HEADERS))
    return f"(VALUES {rows}) AS h(idx, header)"


ORACLE_ISF_MATRIX = f"""
WITH feats AS ({_FEAT_PAIR_SQL}),
cells AS (SELECT * FROM {_matrix_values()}),
headers AS (SELECT * FROM {_header_values()})
SELECT f.feature_id, ha.header AS header_a, hb.header AS header_b, c.code
FROM feats f
JOIN cells c ON c.hi = f.hi AND c.hj = f.hj
JOIN headers ha ON ha.idx = f.hi
JOIN headers hb ON hb.idx = f.hj
"""

QUERIES = {"isf_matrix_checks": q_isf_matrix}
ORACLES = {"isf_matrix_checks": ORACLE_ISF_MATRIX}
