"""Additional condition templates composed from the core joins:

* ``geo_multi_intersections`` — LLMULTINT 114: two lines crossing MORE than
  once (rollup of the crossing join per pair).
* ``geo_cross_away_from_nodes`` — LLNONODEINT 113: a crossing whose
  intersection point is far from every end node of both lines (junctions
  should be noded); integer micro-degree Manhattan tolerance.
* ``geo_isolated_areas`` — ISOLATEDA 116: areals that intersect NOTHING
  (anti-join against the overlap pairs on the same augmented set).
* ``geo_feat_length_checks`` — SHORTFEAT 4 / LONGFEAT 7: per-feature total
  length thresholds, computed as exact integer micro-degree Manhattan sums
  over the variable-vertex lines.
* ``geo_area_size_checks`` — SMALLAREA 3 / BIGAREA 5: outer-ring shoelace
  area (exact integer) against thresholds.

Reference drivers: PerformLinearRelatedChecks geomchecks.c:12715 (LLINT
family), PerformArealRelatedChecks :39633 (ISOLATEDA), errors.c size-check
switch ~12470 (SHORTFEAT/LONGFEAT/SMALLAREA/BIGAREA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.intersections import line_intersections, vertices_to_lines
from ..sources.synthetic import GEO_VIEWS, oracle_cte, register_geo_views
from .vgeomq import CELL, ORACLE_LLINT_V

NODE_TOL_UDEG = 300        # crossing counts as "at a node" within ~33 m
SHORTFEAT_UDEG = 3000      # total Manhattan < ~0.003 deg
LONGFEAT_UDEG = 60000      # total Manhattan > ~0.06 deg
SMALLAREA_UDEG2 = 10_000_000       # |2A| below 1e7 udeg^2 (~0.005 km^2)
BIGAREA_UDEG2 = 80_000_000         # |2A| above 8e7 udeg^2


# --- geo_multi_intersections (LLMULTINT 114) -----------------------------------


def q_multi_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    x = line_intersections(
        vertices_to_lines(spark.table("geo_vlines")), cell_deg=CELL
    )
    return (
        x.groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_crossings"))
        .filter(F.col("n_crossings") > 1)
    )


ORACLE_MULTI_INT = f"""
WITH llint AS ({ORACLE_LLINT_V})
SELECT id_a, id_b, COUNT(*) AS n_crossings
FROM llint GROUP BY 1, 2 HAVING COUNT(*) > 1
"""


# --- geo_cross_away_from_nodes (LLNONODEINT 113) -------------------------------


def q_cross_away_from_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    v = spark.table("geo_vlines")
    x = line_intersections(vertices_to_lines(v), cell_deg=CELL)
    nv = v.groupBy("line_id").agg(F.count("*").alias("_n"))
    ends = (
        v.join(nv, "line_id")
        .filter((F.col("vidx") == 0) | (F.col("vidx") == F.col("_n") - 1))
        .selectExpr(
            "line_id",
            "CAST(floor(x * 1000000.0) AS BIGINT) AS ex",
            "CAST(floor(y * 1000000.0) AS BIGINT) AS ey",
        )
    )
    near_a = (
        x.join(ends, x["id_a"] == ends["line_id"])
        .filter(
            F.expr(
                f"abs(ix_udeg - ex) + abs(iy_udeg - ey) < {NODE_TOL_UDEG}"
            )
        )
        .select("id_a", "id_b", "seg_a", "seg_b")
    )
    near_b = (
        x.join(ends, x["id_b"] == ends["line_id"])
        .filter(
            F.expr(
                f"abs(ix_udeg - ex) + abs(iy_udeg - ey) < {NODE_TOL_UDEG}"
            )
        )
        .select("id_a", "id_b", "seg_a", "seg_b")
    )
    near = near_a.unionByName(near_b).dropDuplicates(
        ["id_a", "id_b", "seg_a", "seg_b"]
    )
    return x.join(near, ["id_a", "id_b", "seg_a", "seg_b"], "left_anti").select(
        "id_a", "id_b", "seg_a", "seg_b", "ix_udeg", "iy_udeg"
    )


ORACLE_NO_NODE_INT = f"""
WITH llint AS ({ORACLE_LLINT_V}),
geo_vlines AS ({GEO_VIEWS['geo_vlines']}),
nv AS (SELECT line_id, COUNT(*) AS n FROM geo_vlines GROUP BY 1),
ends AS (
  SELECT v.line_id,
         CAST(floor(v.x * 1000000.0) AS BIGINT) AS ex,
         CAST(floor(v.y * 1000000.0) AS BIGINT) AS ey
  FROM geo_vlines v JOIN nv USING (line_id)
  WHERE v.vidx = 0 OR v.vidx = nv.n - 1
)
SELECT x.id_a, x.id_b, x.seg_a, x.seg_b, x.ix_udeg, x.iy_udeg
FROM llint x
WHERE NOT EXISTS (
  SELECT 1 FROM ends e
  WHERE (e.line_id = x.id_a OR e.line_id = x.id_b)
    AND abs(x.ix_udeg - e.ex) + abs(x.iy_udeg - e.ey) < {NODE_TOL_UDEG}
)
"""


# --- geo_isolated_areas (ISOLATEDA 116) ----------------------------------------


def q_isolated_areas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .vgeomq import q_area_overlap

    register_geo_views(spark, sf_dir)
    overlaps = q_area_overlap(spark, sf_dir)
    touched = (
        overlaps.select(F.col("id_a").alias("area_id"))
        .unionAll(overlaps.select(F.col("id_b").alias("area_id")))
        .distinct()
    )
    all_areas = spark.table("geo_vareas_ov").select("area_id").distinct()
    return all_areas.join(touched, "area_id", "left_anti")


def _isolated_oracle() -> str:
    from .vgeomq import ORACLE_AREA_OVERLAP_V, _AREAS_OV_SQL

    return f"""
WITH ov AS ({ORACLE_AREA_OVERLAP_V}),
{oracle_cte('geo_vareas').removeprefix('WITH ')},
aug AS ({_AREAS_OV_SQL}),
all_areas AS (SELECT DISTINCT area_id FROM aug)
SELECT a.area_id FROM all_areas a
WHERE NOT EXISTS (SELECT 1 FROM ov WHERE ov.id_a = a.area_id OR ov.id_b = a.area_id)
"""


# --- geo_feat_length_checks (SHORTFEAT 4 / LONGFEAT 7) -------------------------

_MANH_SEG = (
    "abs(CAST(floor(b.x * 1000000.0) AS BIGINT) - CAST(floor(a.x * 1000000.0) AS BIGINT))"
    " + abs(CAST(floor(b.y * 1000000.0) AS BIGINT) - CAST(floor(a.y * 1000000.0) AS BIGINT))"
)


def q_feat_length_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intersections import segments_of_lines

    register_geo_views(spark, sf_dir)
    segs = segments_of_lines(vertices_to_lines(spark.table("geo_vlines")))
    lengths = segs.selectExpr(
        "line_id",
        "abs(CAST(floor(sbx * 1000000.0) AS BIGINT) - CAST(floor(sax * 1000000.0) AS BIGINT))"
        " + abs(CAST(floor(sby * 1000000.0) AS BIGINT) - CAST(floor(say * 1000000.0) AS BIGINT))"
        " AS seg_udeg",
    ).groupBy("line_id").agg(F.sum("seg_udeg").alias("len_udeg"))
    return (
        lengths.withColumn(
            "errtype",
            F.expr(
                f"CASE WHEN len_udeg < {SHORTFEAT_UDEG} THEN 'SHORTFEAT'"
                f" WHEN len_udeg > {LONGFEAT_UDEG} THEN 'LONGFEAT' END"
            ),
        )
        .filter(F.col("errtype").isNotNull())
        .selectExpr("line_id", "errtype", "CAST(len_udeg AS BIGINT) AS len_udeg")
    )


ORACLE_FEAT_LENGTH = f"""
{oracle_cte('geo_vlines')},
segs AS (
  SELECT a.line_id, {_MANH_SEG} AS seg_udeg
  FROM geo_vlines a
  JOIN geo_vlines b ON a.line_id = b.line_id AND b.vidx = a.vidx + 1
),
lens AS (
  SELECT line_id, CAST(SUM(seg_udeg) AS BIGINT) AS len_udeg FROM segs GROUP BY 1
)
SELECT line_id,
       CASE WHEN len_udeg < {SHORTFEAT_UDEG} THEN 'SHORTFEAT'
            WHEN len_udeg > {LONGFEAT_UDEG} THEN 'LONGFEAT' END AS errtype,
       len_udeg
FROM lens
WHERE len_udeg < {SHORTFEAT_UDEG} OR len_udeg > {LONGFEAT_UDEG}
"""


# --- geo_area_size_checks (SMALLAREA 3 / BIGAREA 5) ----------------------------


def q_area_size_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sensq import q_ring_winding

    winding = q_ring_winding(spark, sf_dir).filter("ring = 0")
    return (
        winding.withColumn(
            "errtype",
            F.expr(
                f"CASE WHEN abs(area2_udeg2) < {SMALLAREA_UDEG2} THEN 'SMALLAREA'"
                f" WHEN abs(area2_udeg2) > {BIGAREA_UDEG2} THEN 'BIGAREA' END"
            ),
        )
        .filter(F.col("errtype").isNotNull())
        .selectExpr("area_id", "errtype", "abs(area2_udeg2) AS area2_udeg2")
    )


def _area_size_oracle() -> str:
    from .sensq import ORACLE_RING_WINDING

    return f"""
WITH winding AS ({ORACLE_RING_WINDING})
SELECT area_id,
       CASE WHEN abs(area2_udeg2) < {SMALLAREA_UDEG2} THEN 'SMALLAREA'
            WHEN abs(area2_udeg2) > {BIGAREA_UDEG2} THEN 'BIGAREA' END AS errtype,
       abs(area2_udeg2) AS area2_udeg2
FROM winding
WHERE ring = 0
  AND (abs(area2_udeg2) < {SMALLAREA_UDEG2} OR abs(area2_udeg2) > {BIGAREA_UDEG2})
"""


QUERIES = {
    "geo_multi_intersections": q_multi_intersections,
    "geo_cross_away_from_nodes": q_cross_away_from_nodes,
    "geo_isolated_areas": q_isolated_areas,
    "geo_feat_length_checks": q_feat_length_checks,
    "geo_area_size_checks": q_area_size_checks,
}

ORACLES = {
    "geo_multi_intersections": ORACLE_MULTI_INT,
    "geo_cross_away_from_nodes": ORACLE_NO_NODE_INT,
    "geo_isolated_areas": _isolated_oracle(),
    "geo_feat_length_checks": ORACLE_FEAT_LENGTH,
    "geo_area_size_checks": _area_size_oracle(),
}
