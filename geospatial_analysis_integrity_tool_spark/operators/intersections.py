"""Line x line intersection join — GAIT's LLINT family (SURVEY.md §2.3).

Reference: PerformLinearRelatedChecks (geomchecks.c:12715) tests segment pairs
of co-located lines; LLINT 118 reports proper crossings with the intersection
point as the condition annotation.

Spark-native shape: explode lines into segments (JVM posexplode), cell-join on
segment bbox cover, then the orientation tests run as **pure column
expressions** (whole-stage codegen, no UDF) — the same arithmetic text the
DuckDB oracle evaluates, so the crossing decision and the reported
intersection point are bit-identical.  Pair memoization (CheckThisLinePair,
geomchecks.c:10703) becomes the declarative ``id_a < id_b`` predicate +
dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pip import cell_id, explode_bbox_cells


def _d(ax, ay, bx, by, px, py) -> str:
    """Orientation of p relative to segment a->b (shared SQL text)."""
    return f"(({bx} - {ax}) * ({py} - {ay}) - ({by} - {ay}) * ({px} - {ax}))"


def sql_proper_cross() -> str:
    """Strict proper-crossing predicate over columns _ax.._dy (both engines)."""
    d1 = _d("_ax", "_ay", "_bx", "_by", "_cx", "_cy")
    d2 = _d("_ax", "_ay", "_bx", "_by", "_dx", "_dy")
    d3 = _d("_cx", "_cy", "_dx", "_dy", "_ax", "_ay")
    d4 = _d("_cx", "_cy", "_dx", "_dy", "_bx", "_by")
    return (
        f"((({d1} > 0) <> ({d2} > 0)) AND (({d3} > 0) <> ({d4} > 0))"
        f" AND {d1} <> 0 AND {d2} <> 0 AND {d3} <> 0 AND {d4} <> 0)"
    )


def sql_intersection_xy() -> tuple[str, str]:
    """Intersection point of the (properly crossing) segment pair."""
    rpx = "(_bx - _ax)"
    rpy = "(_by - _ay)"
    spx = "(_dx - _cx)"
    spy = "(_dy - _cy)"
    denom = f"({rpx} * {spy} - {rpy} * {spx})"
    t = f"(((_cx - _ax) * {spy} - (_cy - _ay) * {spx}) / {denom})"
    return f"(_ax + {t} * {rpx})", f"(_ay + {t} * {rpy})"


def segments_of_lines(lines: DataFrame, id_col: str, n_vertices: int = 3) -> DataFrame:
    """(id, x1..xN, y1..yN) -> one row per consecutive segment."""
    segs = []
    for i in range(1, n_vertices):
        segs.append(
            lines.select(
                F.col(id_col).alias("line_id"),
                F.lit(i).alias("seg_idx"),
                F.col(f"x{i}").alias("sax"),
                F.col(f"y{i}").alias("say"),
                F.col(f"x{i + 1}").alias("sbx"),
                F.col(f"y{i + 1}").alias("sby"),
            )
        )
    out = segs[0]
    for s in segs[1:]:
        out = out.unionByName(s)
    return out


def line_intersections(
    lines: DataFrame,
    id_col: str = "line_id",
    n_vertices: int = 3,
    cell_deg: float = 0.01,
    long_cells_cutoff: int = 4,
) -> DataFrame:
    """Proper crossings between segments of different lines.

    Returns (id_a, id_b, seg_a, seg_b, ix_udeg, iy_udeg): ids ordered, and the
    intersection point in integer micro-degrees (floor) as the annotation.

    Giant-feature skew handling (GAIT's AreaSizeCutoff special path,
    TT.c:44196, per SCALE.md): segments covering more than
    ``long_cells_cutoff`` cells would pair with everything along their path
    and blow the cell join up quadratically (measured 930M candidates at
    sf0.1).  They are split off: short x short runs the normal cell join;
    long x short joins the exploded long covers against short cells; and
    long x long — a tiny set by construction — runs as a broadcast
    bbox-predicate join.
    """
    segs = segments_of_lines(lines, id_col, n_vertices)
    segs = segs.withColumn(
        "_ncells",
        (
            (F.floor(F.greatest("sax", "sbx") / cell_deg)
             - F.floor(F.least("sax", "sbx") / cell_deg) + 1)
            * (F.floor(F.greatest("say", "sby") / cell_deg)
               - F.floor(F.least("say", "sby") / cell_deg) + 1)
        ),
    )

    def left_side(df):
        # column names match sql_proper_cross: segment A = (_ax,_ay)-(_bx,_by)
        return df.select(
            F.col("line_id").alias("id_a"),
            F.col("seg_idx").alias("seg_a"),
            F.col("sax").alias("_ax"),
            F.col("say").alias("_ay"),
            F.col("sbx").alias("_bx"),
            F.col("sby").alias("_by"),
            F.least("sax", "sbx").alias("_minx"),
            F.greatest("sax", "sbx").alias("_maxx"),
            F.least("say", "sby").alias("_miny"),
            F.greatest("say", "sby").alias("_maxy"),
        )

    def right_side(df):
        # segment B = (_cx,_cy)-(_dx,_dy)
        return df.select(
            F.col("line_id").alias("id_b"),
            F.col("seg_idx").alias("seg_b"),
            F.col("sax").alias("_cx"),
            F.col("say").alias("_cy"),
            F.col("sbx").alias("_dx"),
            F.col("sby").alias("_dy"),
            F.least("sax", "sbx").alias("_minx2"),
            F.greatest("sax", "sbx").alias("_maxx2"),
            F.least("say", "sby").alias("_miny2"),
            F.greatest("say", "sby").alias("_maxy2"),
        )

    short = segs.filter(F.col("_ncells") <= long_cells_cutoff)
    long = segs.filter(F.col("_ncells") > long_cells_cutoff)

    def lcells(df):
        return explode_bbox_cells(df, "_minx", "_maxx", "_miny", "_maxy", cell_deg)

    def rcells(df):
        return explode_bbox_cells(df, "_minx2", "_maxx2", "_miny2", "_maxy2", cell_deg)

    bbox_overlap = (
        (F.col("_minx") <= F.col("_maxx2"))
        & (F.col("_maxx") >= F.col("_minx2"))
        & (F.col("_miny") <= F.col("_maxy2"))
        & (F.col("_maxy") >= F.col("_miny2"))
    )

    # short x short: plain cell join, ordered ids
    ss = (
        lcells(left_side(short))
        .join(rcells(right_side(short)), "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(bbox_overlap)
    )
    # long x short: long covers exploded against short covers; any id order
    ls = (
        lcells(left_side(long))
        .join(rcells(right_side(short)), "cell")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(bbox_overlap)
    )
    # long x long: tiny side — broadcast bbox join, no cells
    ll = (
        left_side(long)
        .join(F.broadcast(right_side(long)), F.col("id_a") < F.col("id_b"))
        .filter(bbox_overlap)
    )

    def finish(pairs, normalize_order: bool):
        crossed = pairs.filter(F.expr(sql_proper_cross()))
        ix, iy = sql_intersection_xy()
        out = crossed.select(
            "id_a",
            "id_b",
            "seg_a",
            "seg_b",
            F.expr(f"CAST(floor({ix} * 1000000.0) AS BIGINT)").alias("ix_udeg"),
            F.expr(f"CAST(floor({iy} * 1000000.0) AS BIGINT)").alias("iy_udeg"),
        )
        if normalize_order:
            swap = F.col("id_a") > F.col("id_b")
            out = out.select(
                F.when(swap, F.col("id_b")).otherwise(F.col("id_a")).alias("id_a"),
                F.when(swap, F.col("id_a")).otherwise(F.col("id_b")).alias("id_b"),
                F.when(swap, F.col("seg_b")).otherwise(F.col("seg_a")).alias("seg_a"),
                F.when(swap, F.col("seg_a")).otherwise(F.col("seg_b")).alias("seg_b"),
                "ix_udeg",
                "iy_udeg",
            )
        return out

    return (
        finish(ss, False)
        .unionByName(finish(ls, True))
        .unionByName(finish(ll, False))
        .dropDuplicates(["id_a", "id_b", "seg_a", "seg_b"])
    )
