"""LLINT line-intersection join + raster<->vector overlay queries (both named
in the north star) with independent DuckDB oracles.

* geo_line_intersections — engine: segment explode + cell join + JVM
  orientation tests (operators/intersections.py).  Oracle: segment UNION +
  bbox-range join + the same shared predicate text.
* raster_point_grid_dif — engine: tiles table (elevs arrays) + overlay equi-
  join + element_at post sampling (operators/raster.py).  Oracle: closed-form
  elevation formula, no arrays — an independent derivation of the same posts,
  so the overlay join itself is what gets verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.intersections import (
    line_intersections,
    sql_intersection_xy,
    sql_proper_cross,
)
from ..operators.raster import overlay_sample_exact
from ..sources.synthetic import oracle_cte, register_geo_views

# --- geo_line_intersections (LLINT 118) ---------------------------------------


def q_line_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    return line_intersections(spark.table("geo_lines"), n_vertices=3)


_IX, _IY = sql_intersection_xy()
ORACLE_LLINT = f"""
{oracle_cte('geo_lines')},
segs AS (
  SELECT line_id, 1 AS seg_idx, x1 AS sax, y1 AS say, x2 AS sbx, y2 AS sby,
         LEAST(x1, x2) AS mnx, GREATEST(x1, x2) AS mxx,
         LEAST(y1, y2) AS mny, GREATEST(y1, y2) AS mxy
  FROM geo_lines
  UNION ALL
  SELECT line_id, 2, x2, y2, x3, y3,
         LEAST(x2, x3), GREATEST(x2, x3), LEAST(y2, y3), GREATEST(y2, y3)
  FROM geo_lines
),
pairs AS (
  SELECT a.line_id AS id_a, b.line_id AS id_b,
         a.seg_idx AS seg_a, b.seg_idx AS seg_b,
         a.sax AS _ax, a.say AS _ay, a.sbx AS _bx, a.sby AS _by,
         b.sax AS _cx, b.say AS _cy, b.sbx AS _dx, b.sby AS _dy
  FROM segs a JOIN segs b
    ON a.line_id < b.line_id
   AND a.mnx <= b.mxx AND a.mxx >= b.mnx
   AND a.mny <= b.mxy AND a.mxy >= b.mny
)
SELECT id_a, id_b, seg_a, seg_b,
       CAST(floor({_IX} * 1000000.0) AS BIGINT) AS ix_udeg,
       CAST(floor({_IY} * 1000000.0) AS BIGINT) AS iy_udeg
FROM pairs
WHERE {sql_proper_cross()}
"""


# --- raster_point_grid_dif (PT_GRID_DIF 198) ----------------------------------

POSTS = 50          # posts per tile edge
POST_DEG = 0.01
NTILES = 8          # 8x8 tiles over the [10,14) x [40,44) window
DIF_TOL_M = 10.0

_GX = "CAST(floor((lon - 10.0) / 0.01) AS BIGINT)"
_GY = "CAST(floor((lat - 40.0) / 0.01) AS BIGINT)"
_ELEV = "(CAST(((gx * 7919 + gy * 104729) % 4000) AS DOUBLE) / 10.0)"
_Z = (
    f"({_ELEV} + CASE WHEN site_id % 17 = 0 THEN 25.5 ELSE 0.0 END"
    f" + CAST(site_id % 7 AS DOUBLE) / 10.0)"
)

_TILES_EXPR = (
    "transform(sequence(0, {nn}), k -> "
    "CAST(((CAST(tx AS BIGINT) * {p} + k % {p}) * 7919"
    " + (CAST(ty AS BIGINT) * {p} + k DIV {p}) * 104729) % 4000 AS DOUBLE) / 10.0)"
).format(nn=POSTS * POSTS - 1, p=POSTS)


def build_raster_tiles(spark: SparkSession) -> DataFrame:
    """Deterministic DEM fixture: 64 tiles x 50x50 posts (FIXTURES.md §4)."""
    return spark.range(NTILES * NTILES).selectExpr(
        f"CAST(id % {NTILES} AS INT) AS tx",
        f"CAST(id DIV {NTILES} AS INT) AS ty",
        f"10.0 + CAST(id % {NTILES} AS DOUBLE) * 0.5 AS x0",
        f"40.0 + CAST(id DIV {NTILES} AS DOUBLE) * 0.5 AS y0",
        f"{_TILES_EXPR} AS elevs",
    )


def q_raster_point_grid_dif(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    sites = (
        spark.table("geo_sites")
        .selectExpr("site_id", "lon", "lat", f"{_GX} AS gx0", f"{_GY} AS gy0")
        .selectExpr(
            "site_id",
            "lon",
            "lat",
            # z is a function of the point's own post indexes (shared text)
            f"({_ELEV.replace('gx', 'gx0').replace('gy', 'gy0')}"
            " + CASE WHEN site_id % 17 = 0 THEN 25.5 ELSE 0.0 END"
            " + CAST(site_id % 7 AS DOUBLE) / 10.0) AS z",
        )
    )
    tiles = build_raster_tiles(spark)
    sampled = overlay_sample_exact(
        sites, tiles, x_origin=10.0, y_origin=40.0, post_deg=POST_DEG, posts_per_tile=POSTS
    )
    return (
        sampled.withColumn("dif", F.expr("z - elev"))
        .filter(F.expr(f"abs(dif) > {DIF_TOL_M}"))
        .selectExpr(
            "site_id",
            "gx",
            "gy",
            "CAST(floor(dif * 1000.0) AS BIGINT) AS dif_mm",
        )
    )


ORACLE_PT_GRID_DIF = f"""
{oracle_cte('geo_sites')},
pts AS (
  SELECT site_id, {_GX} AS gx, {_GY} AS gy FROM geo_sites
),
zz AS (
  SELECT site_id, gx, gy, {_Z} AS z, {_ELEV} AS elev FROM pts
)
SELECT site_id, gx, gy, CAST(floor((z - elev) * 1000.0) AS BIGINT) AS dif_mm
FROM zz WHERE abs(z - elev) > {DIF_TOL_M}
"""


QUERIES = {
    "geo_line_intersections": q_line_intersections,
    "raster_point_grid_dif": q_raster_point_grid_dif,
}

ORACLES = {
    "geo_line_intersections": ORACLE_LLINT,
    "raster_point_grid_dif": ORACLE_PT_GRID_DIF,
}
