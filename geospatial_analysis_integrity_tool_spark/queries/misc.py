"""Role gating (gated), SimHash dedup (rows-only), multimodal header decode (gated)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.checkspec import apply_roles
from ..operators.simhash import simhash_near_dups
from ..sources.multimodal import (
    decode_media_headers,
    extract_media_features,
    synth_media,
)
from ..sources.synthetic import oracle_cte, register_geo_views, register_testdata_views

# --- check_role_gating (CombinedCheckApplies TT.c:30625) ----------------------

SPEC_ROWS = [
    # (check, instance, role, geom, include, exclude, tol1, active)
    ("PTINREGION", 1, 1, 1, ["AL015", "GB005"], [], 0.0, True),
    ("PTINREGION", 2, 1, 1, [], ["BH140"], 0.0, True),
    ("PTPTPROX", 1, 1, 1, [], [], 5.0, True),
    ("PTPTPROX", 1, 2, 1, ["AP030"], ["AL015"], 5.0, True),
    ("DISABLED", 1, 1, 1, [], [], 0.0, False),
]


def q_check_role_gating(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    features = spark.table("geo_points").selectExpr(
        "point_id AS feature_id", "fcode", "CAST(1 AS INT) AS geom"
    )
    spec = spark.createDataFrame(
        SPEC_ROWS,
        "check string, instance int, role int, geom int, "
        "fcodes_include array<string>, fcodes_exclude array<string>, "
        "tol1 double, active boolean",
    )
    return apply_roles(features, spec)


def _spec_case(check, inst, role, include, exclude) -> str:
    conds = []
    if include:
        inc = ", ".join(f"'{f}'" for f in include)
        conds.append(f"fcode IN ({inc})")
    if exclude:
        exc = ", ".join(f"'{f}'" for f in exclude)
        conds.append(f"fcode NOT IN ({exc})")
    pred = " AND ".join(conds) if conds else "TRUE"
    return (
        f"SELECT '{check}' AS \"check\", {inst} AS instance, {role} AS role,"
        f" point_id AS feature_id, fcode FROM geo_points WHERE {pred}"
    )


ORACLE_ROLE_GATING = f"""
{oracle_cte('geo_points')}
{_spec_case('PTINREGION', 1, 1, ['AL015', 'GB005'], [])}
UNION ALL
{_spec_case('PTINREGION', 2, 1, [], ['BH140'])}
UNION ALL
{_spec_case('PTPTPROX', 1, 1, [], [])}
UNION ALL
{_spec_case('PTPTPROX', 1, 2, ['AP030'], ['AL015'])}
"""


# --- dedup_simhash (rows-only; kernel pytest-gated) ---------------------------
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_testdata_views(spark, sf_dir)
    d = spark.table("documents").select("doc_id", "text")
    pert = d.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.expr("concat_ws(' ', slice(split(text, '\\\\s+'), 2, 1000000))").alias("text"),
    )
    aug = d.unionByName(pert)
    return simhash_near_dups(aug, hamming_max=6)


# --- multimodal_features (GATED: structural header decode round trip) ----------
#
# The engine builds real PNG/JPEG/WAV container bytes (sources/multimodal),
# ships them through the distributed Arrow-batched header parser, and emits
# the decoded facts; the oracle re-derives the same facts CLOSED-FORM from
# the id arithmetic — so a defect anywhere in the encode -> parse pipeline
# (chunk offsets, endianness, segment walking, signed fields) fails the
# hash.  Video payloads stay opaque (full pixel decode is the one stubbed
# step; see sources/multimodal.decode_media).
MM_N = 500


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, MM_N).filter(F.col("kind") != "video")
    return decode_media_headers(media)


ORACLE_MULTIMODAL = f"""
WITH ids AS (SELECT unnest(range(0, {MM_N})) AS i)
SELECT CAST(i AS BIGINT) AS media_id,
       CASE WHEN i % 3 = 0 THEN (CASE WHEN i % 2 = 0 THEN 'png' ELSE 'jpeg' END)
            ELSE 'wav' END AS fmt,
       CASE WHEN i % 3 = 0 THEN CAST(64 + (i * 7) % 512 AS INT) END AS width,
       CASE WHEN i % 3 = 0 THEN CAST(64 + (i * 11) % 512 AS INT) END AS height,
       CASE WHEN i % 3 = 1 THEN CAST(8000 + (i % 5) * 8000 AS INT) END AS sample_rate,
       CASE WHEN i % 3 = 1 THEN CAST(100 + i % 50 AS INT) END AS n_frames
FROM ids WHERE i % 3 <> 2
"""


# rows-only companion: pseudo-embedding feature extraction plumbing
def q_multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = 2000 if "0.1" in sf_dir else 500
    return extract_media_features(synth_media(spark, n)).select(
        "media_id", "kind", "n_bytes", "thumb_w", "thumb_h"
    )


QUERIES = {
    "check_role_gating": q_check_role_gating,
    "dedup_simhash": q_dedup_simhash,
    "multimodal_features": q_multimodal_features,
    "multimodal_embed": q_multimodal_embed,
}

ORACLES = {
    "check_role_gating": ORACLE_ROLE_GATING,
    "multimodal_features": ORACLE_MULTIMODAL,
}
