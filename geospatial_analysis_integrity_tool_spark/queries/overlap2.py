"""Line x area and area x area check families (SURVEY.md §2.3 rows 3-4).

* geo_line_area — LAINT 124 (line crosses areal edge) and LINSIDEA 68 (line
  wholly inside areal): cell join + JVM orientation/sign predicates
  (PerformLinearRelatedChecks geomchecks.c:12715 driver; LineAllInsideArea
  :3725).  Triangles make the exact predicates pure arithmetic — the generic
  ring path uses the ray-cast kernel (operators/pip.py); both semantics match.
* geo_area_overlap — AOVERLAPA 136 (two areals overlap): edge-pair crossing
  or vertex containment either way (TwoArealsIntersect geomchecks.c:36379,
  AreaInsideArea :31105).

All predicates are shared-text arithmetic (bit-identical both engines); the
engine side runs them as whole-stage-codegen column expressions after a
bbox-cell equi-join — no UDFs anywhere in these two operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pip import cell_id, explode_bbox_cells
from ..sources.synthetic import oracle_cte, register_geo_views


def _orient(ax, ay, bx, by, px, py) -> str:
    return f"(({bx} - {ax}) * ({py} - {ay}) - ({by} - {ay}) * ({px} - {ax}))"


def _seg_cross(ax, ay, bx, by, cx, cy, dx, dy) -> str:
    d1 = _orient(cx, cy, dx, dy, ax, ay)
    d2 = _orient(cx, cy, dx, dy, bx, by)
    d3 = _orient(ax, ay, bx, by, cx, cy)
    d4 = _orient(ax, ay, bx, by, dx, dy)
    return (
        f"((({d1} > 0) <> ({d2} > 0)) AND (({d3} > 0) <> ({d4} > 0))"
        f" AND {d1} <> 0 AND {d2} <> 0 AND {d3} <> 0 AND {d4} <> 0)"
    )


def _tri_inside(px, py, x1, y1, x2, y2, x3, y3) -> str:
    d1 = _orient(x1, y1, x2, y2, px, py)
    d2 = _orient(x2, y2, x3, y3, px, py)
    d3 = _orient(x3, y3, x1, y1, px, py)
    return (
        f"(({d1} > 0 AND {d2} > 0 AND {d3} > 0)"
        f" OR ({d1} < 0 AND {d2} < 0 AND {d3} < 0))"
    )


def _line_area_preds(lp: str, ap: str) -> tuple[str, str]:
    """(any_cross, all_inside) for a 3-vertex line vs triangle, with column
    prefixes lp (line x1..y3) and ap (area x1..y3)."""
    tri = [
        (f"{ap}x1", f"{ap}y1", f"{ap}x2", f"{ap}y2"),
        (f"{ap}x2", f"{ap}y2", f"{ap}x3", f"{ap}y3"),
        (f"{ap}x3", f"{ap}y3", f"{ap}x1", f"{ap}y1"),
    ]
    segs = [
        (f"{lp}x1", f"{lp}y1", f"{lp}x2", f"{lp}y2"),
        (f"{lp}x2", f"{lp}y2", f"{lp}x3", f"{lp}y3"),
    ]
    crossings = [
        _seg_cross(*s, *e) for s in segs for e in tri
    ]
    any_cross = "(" + " OR ".join(crossings) + ")"
    inside = [
        _tri_inside(
            f"{lp}x{i}", f"{lp}y{i}",
            f"{ap}x1", f"{ap}y1", f"{ap}x2", f"{ap}y2", f"{ap}x3", f"{ap}y3",
        )
        for i in (1, 2, 3)
    ]
    all_inside = "(" + " AND ".join(inside) + ")"
    return any_cross, all_inside


_LA_CROSS_SP, _LA_INSIDE_SP = _line_area_preds("_l", "_a")
_LA_CROSS_OR, _LA_INSIDE_OR = _line_area_preds("l", "a")


def _bbox_cells(df: DataFrame, prefix: str, cell_deg: float) -> DataFrame:
    return explode_bbox_cells(
        df.withColumn("_minx", F.least(f"{prefix}x1", f"{prefix}x2", f"{prefix}x3"))
        .withColumn("_maxx", F.greatest(f"{prefix}x1", f"{prefix}x2", f"{prefix}x3"))
        .withColumn("_miny", F.least(f"{prefix}y1", f"{prefix}y2", f"{prefix}y3"))
        .withColumn("_maxy", F.greatest(f"{prefix}y1", f"{prefix}y2", f"{prefix}y3")),
        "_minx",
        "_maxx",
        "_miny",
        "_maxy",
        cell_deg,
    )


def q_line_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level crossing + vertex-level containment.

    A whole-line bbox can be 2-D-large (the planted undershoot tails make
    some line bboxes span degrees), which explodes the cell cover
    quadratically.  Per-SEGMENT bboxes are thin (1-D-large at worst) and
    per-VERTEX covers are single cells, so:

    * LAINT  = any line segment properly crosses a triangle edge
               (segment x area cell join);
    * LINSIDEA = all 3 vertices strictly inside (triangles are convex, so
               containment of all vertices excludes any crossing — the two
               categories are exactly the oracle's CASE).
    """
    register_geo_views(spark, sf_dir)
    cell_deg = 0.02
    lines = spark.table("geo_lines")
    areas = spark.table("geo_areas").selectExpr(
        "area_id", "x1 AS _ax1", "y1 AS _ay1", "x2 AS _ax2", "y2 AS _ay2",
        "x3 AS _ax3", "y3 AS _ay3",
    )
    ac = _bbox_cells(areas, "_a", cell_deg).drop("_minx", "_maxx", "_miny", "_maxy")

    # --- crossing: two segments per line, bbox-cell join ---------------------
    segs = None
    for i in (1, 2):
        s = lines.selectExpr(
            "line_id",
            f"x{i} AS _sx1", f"y{i} AS _sy1", f"x{i + 1} AS _sx2", f"y{i + 1} AS _sy2",
        )
        segs = s if segs is None else segs.unionByName(s)
    segs = (
        segs.withColumn("_minx", F.least("_sx1", "_sx2"))
        .withColumn("_maxx", F.greatest("_sx1", "_sx2"))
        .withColumn("_miny", F.least("_sy1", "_sy2"))
        .withColumn("_maxy", F.greatest("_sy1", "_sy2"))
    )
    sc = explode_bbox_cells(segs, "_minx", "_maxx", "_miny", "_maxy", cell_deg).drop(
        "_minx", "_maxx", "_miny", "_maxy"
    )
    tri = [
        ("_ax1", "_ay1", "_ax2", "_ay2"),
        ("_ax2", "_ay2", "_ax3", "_ay3"),
        ("_ax3", "_ay3", "_ax1", "_ay1"),
    ]
    seg_cross = " OR ".join(
        _seg_cross("_sx1", "_sy1", "_sx2", "_sy2", *e) for e in tri
    )
    cross_pairs = (
        sc.join(ac, "cell")
        .filter(F.expr(seg_cross))
        .select("line_id", "area_id")
        .dropDuplicates(["line_id", "area_id"])
    )

    # --- containment: three vertices per line, single-cell join --------------
    verts = None
    for i in (1, 2, 3):
        v = lines.selectExpr("line_id", f"x{i} AS _vx", f"y{i} AS _vy")
        verts = v if verts is None else verts.unionByName(v)
    from ..operators.pip import cell_id as _cid

    vc = verts.withColumn(
        "cell", _cid(F.floor(F.col("_vx") / cell_deg), F.floor(F.col("_vy") / cell_deg))
    )
    inside_pred = _tri_inside(
        "_vx", "_vy", "_ax1", "_ay1", "_ax2", "_ay2", "_ax3", "_ay3"
    )
    inside_pairs = (
        vc.join(ac, "cell")
        .filter(F.expr(inside_pred))
        .groupBy("line_id", "area_id")
        .agg(F.count("*").alias("_nin"))
        .filter(F.col("_nin") == 3)
        .select("line_id", "area_id")
    )

    return cross_pairs.withColumn("errtype", F.lit("LAINT")).unionByName(
        inside_pairs.withColumn("errtype", F.lit("LINSIDEA"))
    )


ORACLE_LINE_AREA = f"""
{oracle_cte('geo_lines', 'geo_areas')},
lb AS (
  SELECT line_id, x1, y1, x2, y2, x3, y3,
         LEAST(x1, x2, x3) AS mnx, GREATEST(x1, x2, x3) AS mxx,
         LEAST(y1, y2, y3) AS mny, GREATEST(y1, y2, y3) AS mxy
  FROM geo_lines
),
ab AS (
  SELECT area_id, x1, y1, x2, y2, x3, y3,
         LEAST(x1, x2, x3) AS mnx, GREATEST(x1, x2, x3) AS mxx,
         LEAST(y1, y2, y3) AS mny, GREATEST(y1, y2, y3) AS mxy
  FROM geo_areas
),
pairs AS (
  SELECT l.line_id, a.area_id,
         l.x1 AS lx1, l.y1 AS ly1, l.x2 AS lx2, l.y2 AS ly2, l.x3 AS lx3, l.y3 AS ly3,
         a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2, a.x3 AS ax3, a.y3 AS ay3
  FROM lb l JOIN ab a
    ON l.mnx <= a.mxx AND l.mxx >= a.mnx AND l.mny <= a.mxy AND l.mxy >= a.mny
)
SELECT line_id, area_id,
       CASE WHEN {_LA_CROSS_OR} THEN 'LAINT'
            WHEN {_LA_INSIDE_OR} THEN 'LINSIDEA' END AS errtype
FROM pairs
WHERE CASE WHEN {_LA_CROSS_OR} THEN 'LAINT'
           WHEN {_LA_INSIDE_OR} THEN 'LINSIDEA' END IS NOT NULL
"""


# augmented area set: every 11th area gets a copy shifted east by w/4 —
# guaranteed overlapping sibling pairs (the raw fixture is too sparse for
# natural overlaps); shared text so both engines see identical geometry
_AREAS_AUG_SQL = """
SELECT area_id, x1, y1, x2, y2, x3, y3 FROM geo_areas
UNION ALL
SELECT area_id + 10000000,
       x1 + CAST(1 + area_id % 5 AS DOUBLE) / 4000.0, y1,
       x2 + CAST(1 + area_id % 5 AS DOUBLE) / 4000.0, y2,
       x3 + CAST(1 + area_id % 5 AS DOUBLE) / 4000.0, y3
FROM geo_areas WHERE area_id % 11 = 0
"""


def q_area_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    cell_deg = 0.02
    aug = spark.sql(_AREAS_AUG_SQL)
    aug.createOrReplaceTempView("geo_areas_aug")
    a = aug.selectExpr(
        "area_id AS id_a", "x1 AS _ax1", "y1 AS _ay1", "x2 AS _ax2", "y2 AS _ay2",
        "x3 AS _ax3", "y3 AS _ay3",
    )
    b = aug.selectExpr(
        "area_id AS id_b", "x1 AS _bx1", "y1 AS _by1", "x2 AS _bx2", "y2 AS _by2",
        "x3 AS _bx3", "y3 AS _by3",
    )
    ac = _bbox_cells(a, "_a", cell_deg).drop("_minx", "_maxx", "_miny", "_maxy")
    bc = _bbox_cells(b, "_b", cell_deg).drop("_minx", "_maxx", "_miny", "_maxy")
    pairs = ac.join(bc, "cell").filter(F.col("id_a") < F.col("id_b"))
    ea = [
        ("_ax1", "_ay1", "_ax2", "_ay2"),
        ("_ax2", "_ay2", "_ax3", "_ay3"),
        ("_ax3", "_ay3", "_ax1", "_ay1"),
    ]
    eb = [
        ("_bx1", "_by1", "_bx2", "_by2"),
        ("_bx2", "_by2", "_bx3", "_by3"),
        ("_bx3", "_by3", "_bx1", "_by1"),
    ]
    cross = " OR ".join(_seg_cross(*s, *t) for s in ea for t in eb)
    a_in_b = _tri_inside("_ax1", "_ay1", "_bx1", "_by1", "_bx2", "_by2", "_bx3", "_by3")
    b_in_a = _tri_inside("_bx1", "_by1", "_ax1", "_ay1", "_ax2", "_ay2", "_ax3", "_ay3")
    return (
        pairs.filter(F.expr(f"({cross}) OR {a_in_b} OR {b_in_a}"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def _ov_pred(ap: str, bp: str) -> str:
    ea = [
        (f"{ap}x1", f"{ap}y1", f"{ap}x2", f"{ap}y2"),
        (f"{ap}x2", f"{ap}y2", f"{ap}x3", f"{ap}y3"),
        (f"{ap}x3", f"{ap}y3", f"{ap}x1", f"{ap}y1"),
    ]
    eb = [
        (f"{bp}x1", f"{bp}y1", f"{bp}x2", f"{bp}y2"),
        (f"{bp}x2", f"{bp}y2", f"{bp}x3", f"{bp}y3"),
        (f"{bp}x3", f"{bp}y3", f"{bp}x1", f"{bp}y1"),
    ]
    cross = " OR ".join(_seg_cross(*s, *t) for s in ea for t in eb)
    a_in_b = _tri_inside(
        f"{ap}x1", f"{ap}y1", f"{bp}x1", f"{bp}y1", f"{bp}x2", f"{bp}y2", f"{bp}x3", f"{bp}y3"
    )
    b_in_a = _tri_inside(
        f"{bp}x1", f"{bp}y1", f"{ap}x1", f"{ap}y1", f"{ap}x2", f"{ap}y2", f"{ap}x3", f"{ap}y3"
    )
    return f"(({cross}) OR {a_in_b} OR {b_in_a})"


ORACLE_AREA_OVERLAP = f"""
{oracle_cte('geo_areas')},
areas_aug AS ({_AREAS_AUG_SQL}),
ab AS (
  SELECT area_id, x1, y1, x2, y2, x3, y3,
         LEAST(x1, x2, x3) AS mnx, GREATEST(x1, x2, x3) AS mxx,
         LEAST(y1, y2, y3) AS mny, GREATEST(y1, y2, y3) AS mxy
  FROM areas_aug
),
pairs AS (
  SELECT a.area_id AS id_a, b.area_id AS id_b,
         a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2, a.x3 AS ax3, a.y3 AS ay3,
         b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2, b.x3 AS bx3, b.y3 AS by3
  FROM ab a JOIN ab b
    ON a.area_id < b.area_id
   AND a.mnx <= b.mxx AND a.mxx >= b.mnx AND a.mny <= b.mxy AND a.mxy >= b.mny
)
SELECT id_a, id_b FROM pairs WHERE {_ov_pred('a', 'b')}
"""

QUERIES = {
    "geo_line_area": q_line_area,
    "geo_area_overlap": q_area_overlap,
}

ORACLES = {
    "geo_line_area": ORACLE_LINE_AREA,
    "geo_area_overlap": ORACLE_AREA_OVERLAP,
}
