"""ISF illegal-attribute-pair matrix at the reference's REAL size.

GAIT compiles per-model N x N compatibility matrices over feature-class
header codes — ``TDS4_ISF_Headers[225]`` with a 225x225 matrix of
'n'/'e'/'g'/'w' cells (not-applicable / error / allowed / warning),
tds_illegals.c:16-60, consumed row-major as ``TDS_ISF[k*N + j]`` in
interface2.c:8051-8075.  Rounds 1-3 ran a synthesized 12x12 stand-in;
this round carries the TRANSCRIBED production matrix
(functions/tds_isf_table.py).

Spark shape: the matrix is ONE 50,625-char string literal and each cell
lookup is ``substring(matrix, hi*225+hj+1, 1)`` — a pure scalar
projection, no join, no broadcast table, nothing to shuffle; at 100 TB
the lookup rides inside whole-stage codegen on the feature scan.  The
225-row header roster is the only (broadcast) join.  The DuckDB oracle
embeds the SAME string literal and the SAME substring arithmetic, so
both engines index the identical matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tds_isf_table import ISF_HEADERS, ISF_MATRIX, ISF_N
from ..sources.synthetic import register_testdata_views

#: feature -> (row header, col header) class-code indexes, derived from part
_FEAT_PAIR_SQL = f"""
SELECT p_partkey AS feature_id,
       CAST(p_partkey % {ISF_N} AS INT) AS hi,
       CAST((p_partkey * 5) % {ISF_N} AS INT) AS hj
FROM part
"""


def _cell_expr(mat_ref: str) -> str:
    """1-char cell code at (hi, hj) — row-major, 1-based substring."""
    return f"substring({mat_ref}, hi * {ISF_N} + hj + 1, 1)"


def q_isf_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_testdata_views(spark, sf_dir)
    feats = spark.sql(_FEAT_PAIR_SQL)
    headers = spark.createDataFrame(
        list(enumerate(ISF_HEADERS)), "idx int, header string"
    )
    lit_mat = "'" + ISF_MATRIX + "'"
    return (
        feats.withColumn("code", F.expr(_cell_expr(lit_mat)))
        .filter(F.col("code") != "n")
        .join(
            F.broadcast(headers.selectExpr("idx AS hi", "header AS header_a")), "hi"
        )
        .join(
            F.broadcast(headers.selectExpr("idx AS hj", "header AS header_b")), "hj"
        )
        .select("feature_id", "header_a", "header_b", "code")
    )


def _header_values() -> str:
    rows = ", ".join(f"({i}, '{h}')" for i, h in enumerate(ISF_HEADERS))
    return f"(VALUES {rows}) AS h(idx, header)"


ORACLE_ISF_MATRIX = f"""
WITH feats AS ({_FEAT_PAIR_SQL}),
headers AS (SELECT * FROM {_header_values()}),
coded AS (
  SELECT feature_id, hi, hj, {_cell_expr("'" + ISF_MATRIX + "'")} AS code
  FROM feats
)
SELECT c.feature_id, ha.header AS header_a, hb.header AS header_b, c.code
FROM coded c
JOIN headers ha ON ha.idx = c.hi
JOIN headers hb ON hb.idx = c.hj
WHERE c.code <> 'n'
"""

QUERIES = {"isf_matrix_checks": q_isf_matrix}
ORACLES = {"isf_matrix_checks": ORACLE_ISF_MATRIX}
