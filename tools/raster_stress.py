"""Raster-family input-scaling stress (round-5 verdict item 5).

The gated raster queries run on a fixed 400x400-post lattice (the oracle
needs the closed form), so sf_dir scaling doesn't exercise them.  This tool
rebuilds the SAME operator shapes on a size-parameterized lattice and times
them at G=400 and G=1280 (10.24x posts), reporting the wall ratio per shape:

  kernel   3x3 residual accumulators (raster_kernel_stats shape:
           8-neighbor explode + join + per-tile agg)
  spikes   8-neighbor max |dif| filter (raster_grid_spikes shape)
  stddev   per-tile exact-integer variance (raster_tile_stats shape)
  hydro_cc connected components over the water mask, 4-adjacency
           (raster_water_mmu shape: pointer-doubling min-label CC)
  overlay  point x post grid equi-join (raster_point_grid_dif shape)

A shape is scale-sound when ratio <= ~1.3x the post ratio (linear in posts;
CC may add a log factor).  One JSON line per run; `main` prints the table.

    python tools/raster_stress.py            # both sizes, report
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

POSTS = 50  # posts per tile edge (same as queries/overlay.py)


def _spark():
    from geospatial_analysis_integrity_tool_spark.session import get_spark

    s = get_spark(
        "gait-raster-stress",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _posts(spark, g: int):
    """Deterministic lattice: integer deci-meter elevations, closed form."""
    return spark.range(g * g).selectExpr(
        f"id % {g} AS gx",
        f"id DIV {g} AS gy",
        # LCG-ish rough terrain + a smooth trend; ~7% water (ed < 700)
        f"(id * 2654435761) % 9000 + (id % {g}) * 2 AS ed",
    )


def run_shapes(spark, g: int) -> dict:
    from pyspark.sql import functions as F

    from geospatial_analysis_integrity_tool_spark.operators.networks import (
        min_label_components,
    )

    p = _posts(spark, g)
    p.count()  # warm

    out: dict = {"g": g, "posts": g * g, "shapes": {}}

    def timed(name, df):
        cols = ", ".join(df.columns)
        t0 = time.time()
        r = df.agg(F.count("*").alias("n"),
                   F.expr(f"bit_xor(xxhash64({cols}))").alias("h")).collect()[0]
        out["shapes"][name] = {
            "sec": round(time.time() - t0, 2),
            "rows": int(r["n"]),
            "hash": int(r["h"] or 0),
        }

    nbr8 = ("explode(array(" + ", ".join(
        f"struct(gx + {dx} AS nx, gy + {dy} AS ny)"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
    ) + ")) AS n")

    interior = p.filter(f"gx >= 1 AND gx <= {g - 2} AND gy >= 1 AND gy <= {g - 2}")
    nbrs = interior.selectExpr("gx", "gy", "ed", nbr8).selectExpr(
        "gx", "gy", "ed", "n.nx AS nx", "n.ny AS ny"
    ).join(p.selectExpr("gx AS nx", "gy AS ny", "ed AS ned"), ["nx", "ny"])

    kernel = (
        nbrs.groupBy("gx", "gy", "ed")
        .agg(F.sum("ned").alias("s8"), F.count("*").alias("nn"))
        .filter("nn = 8")
        .selectExpr(f"gx DIV {POSTS} AS tx", f"gy DIV {POSTS} AS ty",
                    "8 * ed - s8 AS sdif")
        .groupBy("tx", "ty")
        .agg(F.count("*").alias("n"), F.sum("sdif").alias("s1"),
             F.sum(F.expr("sdif * sdif")).alias("s2"))
    )
    timed("kernel", kernel)

    spikes = (
        nbrs.groupBy("gx", "gy", "ed")
        .agg(F.max(F.expr("abs(ed - ned)")).alias("mdif"),
             F.count("*").alias("nn"))
        .filter("nn = 8 AND mdif > 5000")
        .select("gx", "gy", "mdif")
    )
    timed("spikes", spikes)

    stddev = (
        p.selectExpr(f"gx DIV {POSTS} AS tx", f"gy DIV {POSTS} AS ty", "ed")
        .groupBy("tx", "ty")
        .agg(F.count("*").alias("n"), F.sum("ed").alias("s1"),
             F.sum(F.expr("ed * ed")).alias("s2"),
             F.min("ed").alias("mn"), F.max("ed").alias("mx"))
    )
    timed("stddev", stddev)

    water = p.filter("ed % 9002 < 700").selectExpr(f"gx * {2**32} + gy AS id")
    half = (
        p.filter("ed % 9002 < 700")
        .selectExpr(
            "gx", "gy",
            "explode(array(struct(gx + 1 AS nx, gy AS ny),"
            " struct(gx AS nx, gy + 1 AS ny))) AS n")
        .selectExpr(f"gx * {2**32} + gy AS a",
                    f"n.nx * {2**32} + n.ny AS b")
        .join(water.selectExpr("id AS b"), ["b"])
    )
    edges = half.unionByName(half.selectExpr("b AS a", "a AS b"))
    cc = min_label_components(water, edges)
    comp_sizes = cc.groupBy("component_id").agg(F.count("*").alias("sz"))
    timed("hydro_cc", comp_sizes)

    npts = (g * g) // 8
    pts = spark.range(npts).selectExpr(
        "id AS site_id",
        f"(id * 48271) % {g} AS gx",
        f"(id * 69621) % {g} AS gy",
        "(id * 1103515245) % 9000 AS z",
    )
    overlay = pts.join(p, ["gx", "gy"]).selectExpr(
        "site_id", "abs(z - ed) AS dif").filter("dif > 4000")
    timed("overlay", overlay)

    out["total_sec"] = round(sum(s["sec"] for s in out["shapes"].values()), 2)
    return out


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [400, 1280]
    spark = _spark()
    runs = [run_shapes(spark, g) for g in sizes]
    spark.stop()
    small, big = runs[0], runs[-1]
    ratio_posts = big["posts"] / small["posts"]
    shapes = {}
    for name in small["shapes"]:
        r = big["shapes"][name]["sec"] / max(small["shapes"][name]["sec"], 0.01)
        shapes[name] = {
            **{f"sec_{run['g']}": run["shapes"][name]["sec"] for run in runs},
            "time_ratio": round(r, 2),
            "scale_sound": bool(r <= 1.5 * ratio_posts),
        }
    report = {
        "metric": f"raster_stress_{round(ratio_posts)}x",
        "posts_ratio": round(ratio_posts, 2),
        "shapes": shapes,
        "totals": {str(run["g"]): run["total_sec"] for run in runs},
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
