"""Model-polygon ("ThePolys") and region containment checks.

Reference semantics (SEEIT poly checks TT.c:45864-46710 and
geomchecks.c:27443-27680; one-line meanings errors.c:11275-11533):

* ``geo_ptosideregion`` — PTOSIDEREGION 67 (errors.c:11333 "point feature
  not inside any typed areal or poly"): gated-class points with NO
  hole-aware (even-odd over all rings) containment in any areal.
* ``geo_leaon_notin``   — LEAON_NOTIN 76 (errors.c:11316 "line end node on
  area edge, line not inside area"): an end node ON the perimeter (within
  a mm band) whose feature's other end is OUTSIDE the areal.
* ``geo_polyoside``     — POLYOSIDEAREA 236 (errors.c:11332 "Poly
  completely outside all areals of given type"): no corner inside any
  areal and no edge crossing any areal edge.
* ``geo_polyintpoly``   — POLYINTPOLY 237 (errors.c:11275 "two polygons,
  of selected types, intersect"): edge crossings between the model-poly
  layer and its shifted twin (the base lattice is collision-free, as with
  AREAINTAREA — see queries/intvariants.py).
* ``geo_polyintarea``   — POLYINTAREA 238 (errors.c:11317 "polygon -
  areal intersection of edges"): organic cross-lattice crossings between
  the model-poly layer and the areal triangles.
* ``geo_lspint``        — LSPINT 233 (errors.c:11529 "line intersects poly
  with slope > x", GTEQ sensitivity on the plane slope,
  geomchecks.c:27464) and LSPIEXP 234 (:27557-27680 "... except when
  intersection [point lies inside an exception areal]": the role-3
  ``PointInsidePoly(xi, yi, ...)`` suppression at geomchecks.c:27626-27641)
  — both from ONE crossing join; the slope gate is the trig-free form
  cxx^2 + cxy^2 >= tan^2(T) * cxz^2 (no atan, bit-identical across
  engines).

Fixtures: in-module ON-edge stub lines for every 6th areal (every 12th
turns inward -> excluded); a shifted model-poly twin layer; 13 exception
strip-triangles over the window (even strips) for LSPIEXP.

Engine shapes: the hole-aware containment reuses vgeomq._inside_pairs
(cell-cover candidates + RAY_CROSS parity equi-join); crossings run the
codegen cell join; everything is window/join/agg — no UDFs.  DuckDB
oracles use the 0.01-deg cell equi-key for segment joins (IEJoin
avoidance, see queries/intvariants.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.intersections import sql_proper_cross
from ..operators.pip import explode_bbox_cells, with_point_cell
from ..sources.synthetic import oracle_cte, register_geo_views
from .compositionq import POLYS_SQL
from .intvariants import (
    AREA_EDGES_SQL,
    POLY_EDGES_SQL,
    _cellify_sql,
    _seg_cells,
    _sub,
)
from .vgeomq import RAY_CROSS, _inside_pairs

CELL = 0.01
ON_EDGE_M = 0.01        # LEAON_NOTIN end-on-perimeter band (1 cm)
LSP_TAN2 = 3.0          # tan^2(60 deg) = 3: LSPINT slope threshold


# --- geo_ptosideregion (PTOSIDEREGION 67) -------------------------------------------

_VAREA_EDGES = """
SELECT area_id, x AS ex1, y AS ey1,
       COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w) AS ex2,
       COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w) AS ey2
FROM geo_vareas
WINDOW w AS (PARTITION BY area_id, ring ORDER BY vidx)
"""


def q_ptosideregion(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    edges = spark.sql(_VAREA_EDGES)
    sites = spark.table("geo_sites").filter("fcode = 'AT010'")
    probes = sites.selectExpr("site_id", "lon AS px", "lat AS py")
    inside = _inside_pairs(spark, edges, probes, ["site_id"])
    return (
        sites.join(inside.select("site_id").distinct(), "site_id", "left_anti")
        .selectExpr("site_id", "'PTOSIDEREGION' AS errtype")
    )


ORACLE_PTOSIDEREGION = f"""
{oracle_cte('geo_sites', 'geo_vareas')},
edges AS ({_VAREA_EDGES}),
bbox AS (
  SELECT area_id, MIN(x) AS mnx, MAX(x) AS mxx, MIN(y) AS mny, MAX(y) AS mxy
  FROM geo_vareas GROUP BY 1
),
bbx AS (
  SELECT *, unnest(generate_series(CAST(floor(mnx / {CELL}) AS BIGINT),
                                   CAST(floor(mxx / {CELL}) AS BIGINT))) AS cellx
  FROM bbox
),
bc AS MATERIALIZED (
  SELECT *, unnest(generate_series(CAST(floor(mny / {CELL}) AS BIGINT),
                                   CAST(floor(mxy / {CELL}) AS BIGINT))) AS celly
  FROM bbx
),
probes AS (
  SELECT site_id, lon AS px, lat AS py,
         CAST(floor(lon / {CELL}) AS BIGINT) AS cellx,
         CAST(floor(lat / {CELL}) AS BIGINT) AS celly
  FROM geo_sites WHERE fcode = 'AT010'
),
cand AS (
  SELECT p.site_id, p.px, p.py, b.area_id
  FROM probes p JOIN bc b ON p.cellx = b.cellx AND p.celly = b.celly
  WHERE p.px >= b.mnx AND p.px <= b.mxx AND p.py >= b.mny AND p.py <= b.mxy
),
inside AS (
  SELECT c.site_id
  FROM cand c JOIN edges e ON c.area_id = e.area_id
  GROUP BY c.site_id, c.area_id
  HAVING SUM({RAY_CROSS}) % 2 = 1
)
SELECT site_id, 'PTOSIDEREGION' AS errtype
FROM geo_sites
WHERE fcode = 'AT010'
  AND site_id NOT IN (SELECT site_id FROM inside)
"""


# --- geo_leaon_notin (LEAON_NOTIN 76) -------------------------------------------------

# stub lines with one end exactly ON the bottom edge of every 6th areal;
# every 12th turns INWARD (other end inside) -> excluded
STUB_LINES_SQL = """
SELECT
  area_id AS lid,
  x1 + (x2 - x1) / 4.0 AS ax,
  y1 AS ay,
  x1 + (x2 - x1) / 4.0 AS bx,
  CASE WHEN area_id % 12 = 0 THEN y1 + (y3 - y1) / 64.0
       ELSE y1 - 0.0003 END AS by
FROM geo_areas WHERE area_id % 6 = 0
"""

# strictly-inside test for the geo_areas triangle (same-side sign tests;
# vertices (x1,y1) (x2,y2) (x3,y3) are in CCW or CW order — use parity of
# the eastward ray cast over the 3 edges for hole-free robustness)
_TRI_RAY = (
    "((CASE WHEN (y1 > py) <> (y2 > py)"
    " THEN CASE WHEN px < x1 + (py - y1) * (x2 - x1) / (y2 - y1) THEN 1 ELSE 0 END"
    " ELSE 0 END)"
    " + (CASE WHEN (y2 > py) <> (y3 > py)"
    " THEN CASE WHEN px < x2 + (py - y2) * (x3 - x2) / (y3 - y2) THEN 1 ELSE 0 END"
    " ELSE 0 END)"
    " + (CASE WHEN (y3 > py) <> (y1 > py)"
    " THEN CASE WHEN px < x3 + (py - y3) * (x1 - x3) / (y1 - y3) THEN 1 ELSE 0 END"
    " ELSE 0 END)) % 2 = 1"
)


def q_leaon_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.proximity import point_seg_candidates

    register_geo_views(spark, sf_dir)
    stubs = spark.sql(STUB_LINES_SQL)
    edges = spark.sql(AREA_EDGES_SQL)
    on_edge = point_seg_candidates(
        stubs.selectExpr("lid AS src_id", "ax AS px", "ay AS py"),
        edges.selectExpr("aid AS tgt_id", "ax", "ay", "bx", "by"),
        ON_EDGE_M,
        cell_deg=0.001,
        open_interval=False,
    ).select("src_id", "tgt_id").distinct()
    # other-end containment in the SAME areal (triangle parity);
    # candidate (stub other-end, areal) pairs via cell join on the areal bbox
    other = stubs.selectExpr("lid", "bx AS px", "by AS py")
    areas = spark.table("geo_areas").select(
        "area_id", "x1", "y1", "x2", "y2", "x3", "y3"
    )
    ab = areas.withColumns(
        {
            "_mnx": F.least("x1", "x2", "x3"),
            "_mxx": F.greatest("x1", "x2", "x3"),
            "_mny": F.least("y1", "y2", "y3"),
            "_mxy": F.greatest("y1", "y2", "y3"),
        }
    )
    acells = explode_bbox_cells(ab, "_mnx", "_mxx", "_mny", "_mxy", CELL)
    pcells = with_point_cell(other, "px", "py", CELL)
    inside = (
        pcells.join(acells, "cell")
        .filter(
            (F.col("px") >= F.col("_mnx")) & (F.col("px") <= F.col("_mxx"))
            & (F.col("py") >= F.col("_mny")) & (F.col("py") <= F.col("_mxy"))
        )
        .filter(F.expr(_TRI_RAY))
        .select("lid", F.col("area_id").alias("tgt_id"))
        .distinct()
    )
    return (
        on_edge.withColumnRenamed("src_id", "lid")
        .join(inside, ["lid", "tgt_id"], "left_anti")
        .selectExpr("lid", "tgt_id AS aid", "'LEAON_NOTIN' AS errtype")
    )


from ..functions.geodesy import sql_point_seg_dist_m  # noqa: E402

_PSD_S = sql_point_seg_dist_m("s.ax", "s.ay", "e.ax", "e.ay", "e.bx", "e.by")
_TRI_RAY_SA = _sub(
    _TRI_RAY,
    {"px": "s.bx", "py": "s.by", "x1": "a.x1", "y1": "a.y1",
     "x2": "a.x2", "y2": "a.y2", "x3": "a.x3", "y3": "a.y3"},
)

ORACLE_LEAON_NOTIN = f"""
{oracle_cte('geo_areas')},
stubs AS ({STUB_LINES_SQL}),
edges AS ({AREA_EDGES_SQL})
SELECT DISTINCT s.lid, e.aid, 'LEAON_NOTIN' AS errtype
FROM stubs s
JOIN edges e
  ON s.ax >= LEAST(e.ax, e.bx) - 0.001 AND s.ax <= GREATEST(e.ax, e.bx) + 0.001
 AND s.ay >= LEAST(e.ay, e.by) - 0.001 AND s.ay <= GREATEST(e.ay, e.by) + 0.001
WHERE {_PSD_S} >= 0.0 AND {_PSD_S} < {ON_EDGE_M}
  AND NOT EXISTS (
    SELECT 1 FROM geo_areas a
    WHERE a.area_id = e.aid
      AND s.bx >= LEAST(a.x1, a.x2, a.x3) AND s.bx <= GREATEST(a.x1, a.x2, a.x3)
      AND s.by >= LEAST(a.y1, a.y2, a.y3) AND s.by <= GREATEST(a.y1, a.y2, a.y3)
      AND {_TRI_RAY_SA}
  )
"""


# --- geo_polyoside (POLYOSIDEAREA 236) ------------------------------------------------

POLY_CORNERS_SQL = f"""
SELECT poly_id, x1 AS px, y1 AS py FROM ({POLYS_SQL})
UNION ALL
SELECT poly_id, x2, y2 FROM ({POLYS_SQL})
UNION ALL
SELECT poly_id, x3, y3 FROM ({POLYS_SQL})
"""


def q_polyoside(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    polys = spark.sql(POLYS_SQL).filter("poly_id % 5 = 0")
    corners = spark.sql(POLY_CORNERS_SQL).filter("poly_id % 5 = 0")
    areas = spark.table("geo_areas").select(
        "area_id", "x1", "y1", "x2", "y2", "x3", "y3"
    )
    ab = areas.withColumns(
        {
            "_mnx": F.least("x1", "x2", "x3"),
            "_mxx": F.greatest("x1", "x2", "x3"),
            "_mny": F.least("y1", "y2", "y3"),
            "_mxy": F.greatest("y1", "y2", "y3"),
        }
    )
    acells = explode_bbox_cells(ab, "_mnx", "_mxx", "_mny", "_mxy", CELL)
    pcells = with_point_cell(corners, "px", "py", CELL)
    corner_in = (
        pcells.join(acells, "cell")
        .filter(
            (F.col("px") >= F.col("_mnx")) & (F.col("px") <= F.col("_mxx"))
            & (F.col("py") >= F.col("_mny")) & (F.col("py") <= F.col("_mxy"))
        )
        .filter(F.expr(_TRI_RAY))
        .select("poly_id")
        .distinct()
    )
    pedges = spark.sql(POLY_EDGES_SQL).filter("pid % 5 = 0")
    aedges = spark.sql(AREA_EDGES_SQL)
    pc = _seg_cells(pedges).selectExpr(
        "cell", "pid", "ax AS _ax", "ay AS _ay", "bx AS _bx", "by AS _by"
    )
    ac = _seg_cells(aedges).selectExpr(
        "cell", "aid", "ax AS _cx", "ay AS _cy", "bx AS _dx", "by AS _dy"
    )
    edge_x = (
        pc.join(ac, "cell")
        .filter(F.expr(sql_proper_cross()))
        .select(F.col("pid").alias("poly_id"))
        .distinct()
    )
    return (
        polys.select("poly_id")
        .join(corner_in, "poly_id", "left_anti")
        .join(edge_x, "poly_id", "left_anti")
        .selectExpr("poly_id", "'POLYOSIDEAREA' AS errtype")
    )


_TRI_RAY_CA = _sub(
    _TRI_RAY,
    {"px": "c.px", "py": "c.py", "x1": "a.x1", "y1": "a.y1",
     "x2": "a.x2", "y2": "a.y2", "x3": "a.x3", "y3": "a.y3"},
)
_CROSS_PA = _sub(
    sql_proper_cross(),
    {"_ax": "p.ax", "_ay": "p.ay", "_bx": "p.bx", "_by": "p.by",
     "_cx": "a.ax", "_cy": "a.ay", "_dx": "a.bx", "_dy": "a.by"},
)

ORACLE_POLYOSIDE = f"""
{oracle_cte('geo_areas')},
polys AS (SELECT * FROM ({POLYS_SQL}) WHERE poly_id % 5 = 0),
corners AS (SELECT * FROM ({POLY_CORNERS_SQL}) WHERE poly_id % 5 = 0),
pedges AS (SELECT * FROM ({POLY_EDGES_SQL}) WHERE pid % 5 = 0),
aedges AS ({AREA_EDGES_SQL}),
pe2 AS (SELECT pid, ax, ay, bx, by FROM pedges),
ae2 AS (SELECT aid, ax, ay, bx, by FROM aedges),
{_cellify_sql('pe2', 'pc').lstrip().rstrip()},
{_cellify_sql('ae2', 'ac').lstrip().rstrip()},
corner_in AS (
  SELECT DISTINCT c.poly_id
  FROM corners c JOIN geo_areas a
    ON c.px >= LEAST(a.x1, a.x2, a.x3) AND c.px <= GREATEST(a.x1, a.x2, a.x3)
   AND c.py >= LEAST(a.y1, a.y2, a.y3) AND c.py <= GREATEST(a.y1, a.y2, a.y3)
  WHERE {_TRI_RAY_CA}
),
edge_x AS (
  SELECT DISTINCT p.pid AS poly_id
  FROM pc p JOIN ac a ON p.cellx = a.cellx AND p.celly = a.celly
  WHERE p._mnx <= a._mxx AND p._mxx >= a._mnx
    AND p._mny <= a._mxy AND p._mxy >= a._mny
    AND {_CROSS_PA}
)
SELECT poly_id, 'POLYOSIDEAREA' AS errtype
FROM polys
WHERE poly_id NOT IN (SELECT poly_id FROM corner_in)
  AND poly_id NOT IN (SELECT poly_id FROM edge_x)
"""


# --- geo_polyintpoly (POLYINTPOLY 237) ------------------------------------------------

# shifted model-poly twin (the 863/431 lattice is collision-free, like the
# areal lattice — see intvariants.AREAS_B_SQL)
POLYS_B_EDGES_SQL = f"""
SELECT poly_id + 1000000000 AS pid,
       x1 + (x2 - x1) / 2.0 AS ax, y1 + (y3 - y1) / 4.0 AS ay,
       x2 + (x2 - x1) / 2.0 AS bx, y2 + (y3 - y1) / 4.0 AS by
FROM ({POLYS_SQL}) WHERE poly_id % 3 = 0
UNION ALL
SELECT poly_id + 1000000000,
       x2 + (x2 - x1) / 2.0, y2 + (y3 - y1) / 4.0,
       x3 + (x2 - x1) / 2.0, y3 + (y3 - y1) / 4.0
FROM ({POLYS_SQL}) WHERE poly_id % 3 = 0
UNION ALL
SELECT poly_id + 1000000000,
       x3 + (x2 - x1) / 2.0, y3 + (y3 - y1) / 4.0,
       x1 + (x2 - x1) / 2.0, y1 + (y3 - y1) / 4.0
FROM ({POLYS_SQL}) WHERE poly_id % 3 = 0
"""


def q_polyintpoly(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    ea = spark.sql(POLY_EDGES_SQL)
    eb = spark.sql(POLYS_B_EDGES_SQL)
    a = _seg_cells(ea).selectExpr(
        "cell", "pid AS id_a", "ax AS _ax", "ay AS _ay", "bx AS _bx", "by AS _by"
    )
    b = _seg_cells(eb).selectExpr(
        "cell", "pid AS id_b", "ax AS _cx", "ay AS _cy", "bx AS _dx", "by AS _dy"
    )
    return (
        a.join(b, "cell")
        .filter(F.expr(sql_proper_cross()))
        .select("id_a", "id_b")
        .distinct()
        .selectExpr("id_a", "id_b", "'POLYINTPOLY' AS errtype")
    )


_CROSS_AB2 = _sub(
    sql_proper_cross(),
    {"_ax": "a.ax", "_ay": "a.ay", "_bx": "a.bx", "_by": "a.by",
     "_cx": "b.ax", "_cy": "b.ay", "_dx": "b.bx", "_dy": "b.by"},
)

ORACLE_POLYINTPOLY = f"""
WITH ea AS (SELECT pid, ax, ay, bx, by FROM ({POLY_EDGES_SQL})),
eb AS ({POLYS_B_EDGES_SQL}),
{_cellify_sql('ea', 'eac').lstrip().rstrip()},
{_cellify_sql('eb', 'ebc').lstrip().rstrip()}
SELECT DISTINCT a.pid AS id_a, b.pid AS id_b, 'POLYINTPOLY' AS errtype
FROM eac a JOIN ebc b ON a.cellx = b.cellx AND a.celly = b.celly
WHERE a._mnx <= b._mxx AND a._mxx >= b._mnx
  AND a._mny <= b._mxy AND a._mxy >= b._mny
  AND {_CROSS_AB2}
"""


# --- geo_polyintarea (POLYINTAREA 238) ------------------------------------------------


def q_polyintarea(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    pe = spark.sql(POLY_EDGES_SQL)
    ae = spark.sql(AREA_EDGES_SQL)
    p = _seg_cells(pe).selectExpr(
        "cell", "pid", "ax AS _ax", "ay AS _ay", "bx AS _bx", "by AS _by"
    )
    a = _seg_cells(ae).selectExpr(
        "cell", "aid", "ax AS _cx", "ay AS _cy", "bx AS _dx", "by AS _dy"
    )
    return (
        p.join(a, "cell")
        .filter(F.expr(sql_proper_cross()))
        .select("pid", "aid")
        .distinct()
        .selectExpr("pid AS poly_id", "aid AS area_id",
                    "'POLYINTAREA' AS errtype")
    )


ORACLE_POLYINTAREA = f"""
{oracle_cte('geo_areas')},
pe AS (SELECT pid, ax, ay, bx, by FROM ({POLY_EDGES_SQL})),
ae AS (SELECT aid, ax, ay, bx, by FROM ({AREA_EDGES_SQL})),
{_cellify_sql('pe', 'pc').lstrip().rstrip()},
{_cellify_sql('ae', 'ac').lstrip().rstrip()}
SELECT DISTINCT p.pid AS poly_id, a.aid AS area_id, 'POLYINTAREA' AS errtype
FROM pc p JOIN ac a ON p.cellx = a.cellx AND p.celly = a.celly
WHERE p._mnx <= a._mxx AND p._mxx >= a._mnx
  AND p._mny <= a._mxy AND p._mxy >= a._mny
  AND {_sub(sql_proper_cross(), {"_ax": "p.ax", "_ay": "p.ay", "_bx": "p.bx", "_by": "p.by", "_cx": "a.ax", "_cy": "a.ay", "_dx": "a.bx", "_dy": "a.by"})}
"""


# --- geo_lspint (LSPINT 233 / LSPIEXP 234) --------------------------------------------

from ..functions.geodesy import sql_coslat_poly  # noqa: E402

_MLON_P = f"(111319.5 * {sql_coslat_poly('((y1 + y2 + y3) / 3.0)')})"
_CXX = "((y2 - y1) * 111319.5 * (z3 - z1) - (z2 - z1) * (y3 - y1) * 111319.5)"
_CXY = f"((z2 - z1) * (x3 - x1) * {_MLON_P} - (x2 - x1) * {_MLON_P} * (z3 - z1))"
_CXZ = (
    f"((x2 - x1) * {_MLON_P} * (y3 - y1) * 111319.5"
    f" - (y2 - y1) * 111319.5 * (x3 - x1) * {_MLON_P})"
)
_STEEP = f"({_CXX} * {_CXX} + {_CXY} * {_CXY}) >= {LSP_TAN2} * ({_CXZ} * {_CXZ})"

STEEP_EDGES_SQL = f"""
SELECT pid, ax, ay, bx, by FROM (
  SELECT poly_id AS pid, x1 AS ax, y1 AS ay, x2 AS bx, y2 AS by, {_STEEP} AS steep
  FROM ({POLYS_SQL})
  UNION ALL
  SELECT poly_id, x2, y2, x3, y3, {_STEEP} FROM ({POLYS_SQL})
  UNION ALL
  SELECT poly_id, x3, y3, x1, y1, {_STEEP} FROM ({POLYS_SQL})
) WHERE steep
"""

# exception areals: 13 strip triangles over the window (even strips);
# crossing points strictly inside are exempt (geomchecks.c:27626 role-3
# PointInsidePoly suppression)
EXC_AREAS_SQL = """
SELECT n_nationkey AS eid,
       10.0 + CAST(n_nationkey AS DOUBLE) * 0.16          AS tx1,
       40.0                                               AS ty1,
       10.0 + CAST(n_nationkey AS DOUBLE) * 0.16 + 0.159  AS tx2,
       40.0                                               AS ty2,
       10.0 + CAST(n_nationkey AS DOUBLE) * 0.16          AS tx3,
       44.0                                               AS ty3
FROM nation WHERE n_nationkey % 2 = 0
"""

_IN_EXC = _sub(
    _TRI_RAY,
    {"px": "ix", "py": "iy", "x1": "tx1", "y1": "ty1",
     "x2": "tx2", "y2": "ty2", "x3": "tx3", "y3": "ty3"},
)

LSP_LINE_SEGS_SQL = """
SELECT line_id AS sid, x1 AS ax, y1 AS ay, x2 AS bx, y2 AS by FROM geo_lines
UNION ALL
SELECT line_id, x2, y2, x3, y3 FROM geo_lines
"""

# zero-denominator-guarded intersection point (ANSI mode can evaluate the
# projection speculatively on rows the proper-cross filter would drop)
from .proxvariants import _guarded_xy  # noqa: E402

_IXS, _IYS = _guarded_xy()


def q_lspint(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    lsegs = spark.sql(LSP_LINE_SEGS_SQL)
    # materialize the (small) poly layer once: the fixture synthesis CASEs
    # plus the steep predicate inlined 3x per edge branch blow the codegen
    # unit past the JIT limit (132 s -> ~10 s); after the checkpoint the
    # steep filter and edge explode run over plain columns
    p = spark.sql(POLYS_SQL).localCheckpoint()
    steep = p.filter(F.expr(_STEEP))
    sedges = steep.select(
        F.col("poly_id").alias("pid"),
        F.explode(
            F.array(
                F.struct(
                    F.col("x1").alias("ax"), F.col("y1").alias("ay"),
                    F.col("x2").alias("bx"), F.col("y2").alias("by"),
                ),
                F.struct(
                    F.col("x2").alias("ax"), F.col("y2").alias("ay"),
                    F.col("x3").alias("bx"), F.col("y3").alias("by"),
                ),
                F.struct(
                    F.col("x3").alias("ax"), F.col("y3").alias("ay"),
                    F.col("x1").alias("bx"), F.col("y1").alias("by"),
                ),
            )
        ).alias("e"),
    ).select("pid", "e.ax", "e.ay", "e.bx", "e.by")
    lc = _seg_cells(lsegs).selectExpr(
        "cell", "sid", "ax AS _ax", "ay AS _ay", "bx AS _bx", "by AS _by"
    )
    sc = _seg_cells(sedges).selectExpr(
        "cell", "pid", "ax AS _cx", "ay AS _cy", "bx AS _dx", "by AS _dy"
    )
    xings = (
        lc.join(sc, "cell")
        .filter(F.expr(sql_proper_cross()))
        .select(
            "sid", "pid",
            F.expr(_IXS).alias("ix"), F.expr(_IYS).alias("iy"),
        )
        .dropDuplicates(["sid", "pid", "ix", "iy"])
    )
    exc = spark.table("nation").selectExpr(
        "n_nationkey AS eid",
        "10.0 + CAST(n_nationkey AS DOUBLE) * 0.16 AS tx1", "40.0 AS ty1",
        "10.0 + CAST(n_nationkey AS DOUBLE) * 0.16 + 0.159 AS tx2", "40.0 AS ty2",
        "10.0 + CAST(n_nationkey AS DOUBLE) * 0.16 AS tx3", "44.0 AS ty3",
    ).filter("eid % 2 = 0")
    in_exc = (
        xings.join(F.broadcast(exc))
        .filter(F.expr(_IN_EXC))
        .select("sid", "pid", "ix", "iy")
        .distinct()
    )
    lspint = xings.select(
        "sid", "pid", F.lit("LSPINT").alias("errtype")
    ).distinct()
    lspiexp = (
        xings.join(in_exc, ["sid", "pid", "ix", "iy"], "left_anti")
        .select("sid", "pid", F.lit("LSPIEXP").alias("errtype"))
        .distinct()
    )
    return lspint.unionByName(lspiexp)


_CROSS_LS = _sub(
    sql_proper_cross(),
    {"_ax": "l.ax", "_ay": "l.ay", "_bx": "l.bx", "_by": "l.by",
     "_cx": "s.ax", "_cy": "s.ay", "_dx": "s.bx", "_dy": "s.by"},
)
_IX_LS = _sub(_IXS, {"_ax": "l.ax", "_ay": "l.ay", "_bx": "l.bx", "_by": "l.by",
                     "_cx": "s.ax", "_cy": "s.ay", "_dx": "s.bx", "_dy": "s.by"})
_IY_LS = _sub(_IYS, {"_ax": "l.ax", "_ay": "l.ay", "_bx": "l.bx", "_by": "l.by",
                     "_cx": "s.ax", "_cy": "s.ay", "_dx": "s.bx", "_dy": "s.by"})

ORACLE_LSPINT = f"""
{oracle_cte('geo_lines')},
lsegs AS ({LSP_LINE_SEGS_SQL}),
sedges AS ({STEEP_EDGES_SQL}),
{_cellify_sql('lsegs', 'lc').lstrip().rstrip()},
{_cellify_sql('sedges', 'sc').lstrip().rstrip()},
xings AS (
  SELECT DISTINCT l.sid, s.pid, {_IX_LS} AS ix, {_IY_LS} AS iy
  FROM lc l JOIN sc s ON l.cellx = s.cellx AND l.celly = s.celly
  WHERE l._mnx <= s._mxx AND l._mxx >= s._mnx
    AND l._mny <= s._mxy AND l._mxy >= s._mny
    AND {_CROSS_LS}
),
exc AS ({EXC_AREAS_SQL})
SELECT DISTINCT sid, pid, 'LSPINT' AS errtype FROM xings
UNION ALL
SELECT DISTINCT sid, pid, 'LSPIEXP' FROM xings x
WHERE NOT EXISTS (
  SELECT 1 FROM exc
  WHERE {_sub(_IN_EXC, {"ix": "x.ix", "iy": "x.iy"})}
)
"""


QUERIES = {
    "geo_ptosideregion": q_ptosideregion,
    "geo_leaon_notin": q_leaon_notin,
    "geo_polyoside": q_polyoside,
    "geo_polyintpoly": q_polyintpoly,
    "geo_polyintarea": q_polyintarea,
    "geo_lspint": q_lspint,
}

ORACLES = {
    "geo_ptosideregion": ORACLE_PTOSIDEREGION,
    "geo_leaon_notin": ORACLE_LEAON_NOTIN,
    "geo_polyoside": ORACLE_POLYOSIDE,
    "geo_polyintpoly": ORACLE_POLYINTPOLY,
    "geo_polyintarea": ORACLE_POLYINTAREA,
    "geo_lspint": ORACLE_LSPINT,
}
