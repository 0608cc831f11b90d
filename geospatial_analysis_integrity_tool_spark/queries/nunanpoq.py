"""NUNANPO attribution-mode domain validation (NFDD, the largest model).

The reference swaps the active enum tables to the per-attribute NUNANPO
domain when that attribution mode is selected (interface3.c:4047-4059;
allow_nunanpo modes TT.c:23278): values carrying the No-Unknown / Null /
Populated-Only sentinels are legal under nunanpo but violations under the
strict domain.  ``attr_nfdd_nunanpo`` drives BOTH transcribed domains
(functions/schema_models.json strict + functions/schema_nunanpo.json wide)
over a planted fixture and classifies each value:

* NUNANPO_ONLY — legal in the nunanpo domain, NOT in the strict one (the
  delta the mode exists for: flagged under strict attribution, accepted
  under nunanpo);
* BADVALUE     — in neither domain (violation under every mode).

Spark shape: two broadcast membership joins (the NFDD nunanpo table is
~500 KB); zero extra shuffle on the feature stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.schema_models import all_models
from ..functions.schema_nunanpo import nunanpo_enums
from ..sources.synthetic import register_testdata_views

MODEL = "NFDD"
N_FEATURES = 6000


def _q(s: str) -> str:
    return s.replace("'", "''")


def _tables():
    strict = all_models()[MODEL]["enums"]
    wide = nunanpo_enums(MODEL)
    attrs = sorted(set(strict) & set(wide))
    strict_rows = [
        (a, v) for a in attrs for v in strict[a]
    ]
    wide_rows = [(a, i, v) for a in attrs for i, v in enumerate(wide[a])]
    n_wide = {a: len(wide[a]) for a in attrs}
    attr_rows = [(i, a, n_wide[a]) for i, a in enumerate(attrs)]
    return attr_rows, strict_rows, wide_rows


_FIX = {
    "aidx": "(o_orderkey * 7)",
    "mode": "(o_orderkey % 17)",  # 0 -> plant a bad value
    "eidx_seed": "(o_orderkey * 11)",
}


def q_attr_nfdd_nunanpo(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_testdata_views(spark, sf_dir)
    attr_rows, strict_rows, wide_rows = _tables()
    n_attr = len(attr_rows)
    feats = (
        spark.table("orders")
        .filter(f"o_orderkey < {N_FEATURES}")
        .selectExpr(
            "o_orderkey AS feature_id",
            f"{_FIX['aidx']} % {n_attr} AS aidx",
            f"{_FIX['mode']} AS mode",
            f"{_FIX['eidx_seed']} AS eidx_seed",
        )
    )
    attrs = spark.createDataFrame(attr_rows, "aidx long, attr string, n_wide long")
    wide = spark.createDataFrame(wide_rows, "attr string, eidx long, evalue string")
    strict = spark.createDataFrame(strict_rows, "attr string, value string").withColumn(
        "_s", F.lit(1)
    )
    wide_ok = wide.select("attr", F.col("evalue").alias("value")).withColumn(
        "_w", F.lit(1)
    )
    wide_k = wide.selectExpr(
        "attr AS w_attr", "eidx AS w_eidx", "evalue"
    )
    resolved = (
        feats.join(F.broadcast(attrs), "aidx")
        .withColumn("evalue_key", F.expr("eidx_seed % n_wide"))
        .join(
            F.broadcast(wide_k),
            (F.col("attr") == F.col("w_attr"))
            & (F.col("evalue_key") == F.col("w_eidx")),
            "left",
        )
        .selectExpr(
            "feature_id", "attr",
            "CASE WHEN mode = 0 THEN '999999999' ELSE evalue END AS value",
        )
    )
    return (
        resolved.join(F.broadcast(strict), ["attr", "value"], "left")
        .join(F.broadcast(wide_ok), ["attr", "value"], "left")
        .withColumn(
            "verdict",
            F.expr(
                "CASE WHEN _w = 1 AND _s IS NULL THEN 'NUNANPO_ONLY'"
                " WHEN _w IS NULL AND _s IS NULL THEN 'BADVALUE' END"
            ),
        )
        .filter(F.col("verdict").isNotNull())
        .select("feature_id", "attr", "value", "verdict")
    )


def _oracle() -> str:
    attr_rows, strict_rows, wide_rows = _tables()
    n_attr = len(attr_rows)
    a_v = ", ".join(f"({r[0]}, '{_q(r[1])}', {r[2]})" for r in attr_rows)
    s_v = ", ".join(f"('{_q(a)}', '{_q(v)}')" for a, v in strict_rows)
    w_v = ", ".join(f"('{_q(r[0])}', {r[1]}, '{_q(r[2])}')" for r in wide_rows)
    return f"""
WITH attrs AS (SELECT * FROM (VALUES {a_v}) t(aidx, attr, n_wide)),
strict AS (SELECT * FROM (VALUES {s_v}) t(attr, value)),
wide AS (SELECT * FROM (VALUES {w_v}) t(attr, eidx, evalue)),
feats AS (
  SELECT o_orderkey AS feature_id,
         {_FIX['aidx']} % {n_attr} AS aidx,
         {_FIX['mode']} AS mode,
         {_FIX['eidx_seed']} AS eidx_seed
  FROM orders WHERE o_orderkey < {N_FEATURES}
),
resolved AS (
  SELECT f.feature_id, a.attr,
         CASE WHEN f.mode = 0 THEN '999999999' ELSE w.evalue END AS value
  FROM feats f
  JOIN attrs a ON a.aidx = f.aidx
  LEFT JOIN wide w ON w.attr = a.attr AND w.eidx = f.eidx_seed % a.n_wide
)
SELECT r.feature_id, r.attr, r.value,
       CASE WHEN w2.attr IS NOT NULL AND s2.attr IS NULL THEN 'NUNANPO_ONLY'
            WHEN w2.attr IS NULL AND s2.attr IS NULL THEN 'BADVALUE' END AS verdict
FROM resolved r
LEFT JOIN strict s2 ON s2.attr = r.attr AND s2.value = r.value
LEFT JOIN (SELECT DISTINCT attr, evalue FROM wide) w2
       ON w2.attr = r.attr AND w2.evalue = r.value
WHERE (w2.attr IS NOT NULL AND s2.attr IS NULL)
   OR (w2.attr IS NULL AND s2.attr IS NULL)
"""


QUERIES = {"attr_nfdd_nunanpo": q_attr_nfdd_nunanpo}
ORACLES = {"attr_nfdd_nunanpo": _oracle()}
