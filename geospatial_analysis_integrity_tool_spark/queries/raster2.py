"""DEM statistics + spike checks over the raster tiles table.

* raster_tile_stats — per-tile elevation statistics (GenerateKernelStats /
  GRID_STD_DEV family, moregeomchecks.c:7692): sums kept in exact integer
  deci-meters so cross-engine float summation order cannot matter.
* raster_grid_spikes — GSPIKE 200: interior post differing from its
  4-neighbor mean by more than a threshold.  Engine: numpy neighbor kernel
  per tile (mapInPandas); oracle: the closed-form elevation formula evaluated
  at the four neighbors (an independent derivation).  Tile-edge posts are
  skipped on both sides (neighbor-tile stitching is the cross-cell join case,
  handled like edge matching; deferred).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .overlay import NTILES, POSTS, build_raster_tiles

# the LCG elevation surface yields dif4 in exact multiples of 400 m (modular
# wraps): 100.05 m sits between the single- and double-wrap levels, flagging
# the ~4% double-wrap posts as spikes
SPIKE_TOL_M = 100.05


# --- raster_tile_stats --------------------------------------------------------
def q_raster_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiles = build_raster_tiles(spark)
    # elevs are exact multiples of 0.1 -> integer deci-meters, exact sums
    return tiles.selectExpr(
        "tx",
        "ty",
        "CAST(aggregate(elevs, 0L, (acc, e) -> acc + CAST(e * 10.0 AS BIGINT)) AS BIGINT)"
        " AS sum_decim",
        "CAST(aggregate(elevs, 0L, (acc, e) -> acc + CAST(e * 10.0 AS BIGINT)"
        " * CAST(e * 10.0 AS BIGINT)) AS BIGINT) AS sumsq_decim2",
        "CAST(aggregate(elevs, CAST(-1 AS BIGINT), (acc, e) ->"
        " greatest(acc, CAST(e * 10.0 AS BIGINT))) AS BIGINT) AS max_decim",
        "CAST(aggregate(elevs, CAST(999999 AS BIGINT), (acc, e) ->"
        " least(acc, CAST(e * 10.0 AS BIGINT))) AS BIGINT) AS min_decim",
    )


_ELEV_DECIM = "CAST((((tx * {p} + lx) * 7919 + (ty * {p} + ly) * 104729) % 4000) AS BIGINT)".format(
    p=POSTS
)

ORACLE_TILE_STATS = f"""
WITH grid AS (
  SELECT t.tx, t.ty, lx.lx, ly.ly, {_ELEV_DECIM} AS e
  FROM (SELECT tx_i AS tx, ty_i AS ty
        FROM (SELECT unnest(range(0, {NTILES})) AS tx_i),
             (SELECT unnest(range(0, {NTILES})) AS ty_i)) t,
       (SELECT unnest(range(0, {POSTS})) AS lx) lx,
       (SELECT unnest(range(0, {POSTS})) AS ly) ly
)
SELECT CAST(tx AS INT) AS tx, CAST(ty AS INT) AS ty,
       CAST(SUM(e) AS BIGINT) AS sum_decim,
       CAST(SUM(e * e) AS BIGINT) AS sumsq_decim2,
       CAST(MAX(e) AS BIGINT) AS max_decim,
       CAST(MIN(e) AS BIGINT) AS min_decim
FROM grid GROUP BY 1, 2
"""


# --- raster_grid_spikes -------------------------------------------------------
def q_raster_grid_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiles = build_raster_tiles(spark)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for _, row in pdf.iterrows():
                E = np.asarray(row["elevs"], dtype=np.float64).reshape(POSTS, POSTS)
                # interior posts: 4-neighbor mean in exact deci-meter ints
                Ed = np.rint(E * 10.0).astype(np.int64)
                c = Ed[1:-1, 1:-1]
                nb4 = Ed[:-2, 1:-1] + Ed[2:, 1:-1] + Ed[1:-1, :-2] + Ed[1:-1, 2:]
                # |4*c - sum(nb)| > 4 * tol  (integer arithmetic, no division)
                dif4 = 4 * c - nb4
                mask = np.abs(dif4) > int(4 * SPIKE_TOL_M * 10)
                ys, xs = np.nonzero(mask)
                if len(xs) == 0:
                    continue
                out.append(
                    pd.DataFrame(
                        {
                            "gx": int(row["tx"]) * POSTS + xs + 1,
                            "gy": int(row["ty"]) * POSTS + ys + 1,
                            "dif4_decim": dif4[ys, xs],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return tiles.select("tx", "ty", "elevs").mapInPandas(
        run, schema="gx long, gy long, dif4_decim long"
    )


def _e(gx: str, gy: str) -> str:
    return f"CAST(((({gx}) * 7919 + ({gy}) * 104729) % 4000) AS BIGINT)"


ORACLE_GRID_SPIKES = f"""
WITH posts AS (
  SELECT gx.gx, gy.gy
  FROM (SELECT unnest(range(0, {NTILES * POSTS})) AS gx) gx,
       (SELECT unnest(range(0, {NTILES * POSTS})) AS gy) gy
  WHERE gx.gx % {POSTS} NOT IN (0, {POSTS - 1})
    AND gy.gy % {POSTS} NOT IN (0, {POSTS - 1})
),
difs AS (
  SELECT gx, gy,
         4 * {_e('gx', 'gy')}
         - ({_e('gx', 'gy - 1')} + {_e('gx', 'gy + 1')}
            + {_e('gx - 1', 'gy')} + {_e('gx + 1', 'gy')}) AS dif4_decim
  FROM posts
)
SELECT gx, gy, dif4_decim
FROM difs WHERE abs(dif4_decim) > {int(4 * SPIKE_TOL_M * 10)}
"""

# --- raster_grid_spikes_global: cross-tile variant ----------------------------
# The per-tile kernel above skips tile-edge posts; this variant explodes the
# tiles into a posts relation and finds every spike (incl. across tile seams)
# with a single neighbor equi-join — the raster analogue of the cross-cell
# edge-match join the cell partitioning gives for free.
def q_raster_grid_spikes_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiles = build_raster_tiles(spark)
    posts = tiles.selectExpr(
        "tx", "ty", "posexplode(elevs) AS (k, e)"
    ).selectExpr(
        f"CAST(tx AS BIGINT) * {POSTS} + k % {POSTS} AS gx",
        f"CAST(ty AS BIGINT) * {POSTS} + k DIV {POSTS} AS gy",
        "CAST(e * 10.0 AS BIGINT) AS ed",
    )
    nb = posts.selectExpr("gx AS nx", "gy AS ny", "ed AS ned")
    # neighbor offsets exploded from the center post
    center = posts.selectExpr(
        "gx", "gy", "ed",
        "explode(array(struct(gx - 1 AS nx, gy AS ny), struct(gx + 1 AS nx, gy AS ny),"
        " struct(gx AS nx, gy - 1 AS ny), struct(gx AS nx, gy + 1 AS ny))) AS n",
    ).selectExpr("gx", "gy", "ed", "n.nx AS nx", "n.ny AS ny")
    joined = center.join(nb, ["nx", "ny"])
    agg = (
        joined.groupBy("gx", "gy", "ed")
        .agg(F.count("*").alias("_n"), F.sum("ned").alias("_nsum"))
        .filter(F.col("_n") == 4)  # interior of the mosaic only
        .selectExpr("gx", "gy", "4 * ed - _nsum AS dif4_decim")
        .filter(F.expr(f"abs(dif4_decim) > {int(4 * SPIKE_TOL_M * 10)}"))
    )
    return agg


ORACLE_GRID_SPIKES_GLOBAL = f"""
WITH posts AS (
  SELECT gx.gx, gy.gy
  FROM (SELECT unnest(range(0, {NTILES * POSTS})) AS gx) gx,
       (SELECT unnest(range(0, {NTILES * POSTS})) AS gy) gy
  WHERE gx.gx NOT IN (0, {NTILES * POSTS - 1})
    AND gy.gy NOT IN (0, {NTILES * POSTS - 1})
),
difs AS (
  SELECT gx, gy,
         4 * {_e('gx', 'gy')}
         - ({_e('gx', 'gy - 1')} + {_e('gx', 'gy + 1')}
            + {_e('gx - 1', 'gy')} + {_e('gx + 1', 'gy')}) AS dif4_decim
  FROM posts
)
SELECT gx, gy, dif4_decim
FROM difs WHERE abs(dif4_decim) > {int(4 * SPIKE_TOL_M * 10)}
"""

QUERIES = {
    "raster_tile_stats": q_raster_tile_stats,
    "raster_grid_spikes": q_raster_grid_spikes,
    "raster_grid_spikes_global": q_raster_grid_spikes_global,
}

ORACLES = {
    "raster_tile_stats": ORACLE_TILE_STATS,
    "raster_grid_spikes": ORACLE_GRID_SPIKES,
    "raster_grid_spikes_global": ORACLE_GRID_SPIKES_GLOBAL,
}
