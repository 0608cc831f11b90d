"""Point-in-polygon spatial hash join (the north rule's flagship operator).

Strategy (replaces GAIT's per-region nested loop, CheckRegion TT.c:43916 +
PointInsidePoly TT.c:6920):

1. **Cell encode** both sides onto an integer lon/lat grid: points to their
   single cell, polygons to every cell their bbox covers (the Spark analogue of
   GAIT's neighbor-region duplication, TT.c:44027-44030 /
   FindApplicableNeighborFeatures geomchecks.c:4602).
2. **Equi-join on cell id** — Catalyst picks broadcast when the polygon side is
   small (the common dim case) and a shuffled hash join otherwise; AQE splits
   skewed cells.  At 100 TB the polygon cover is the salted build side; hot
   cells are split upstream by plans/partitioning.py.
3. **Exact refine** with the vectorized ray-cast kernel (Arrow batches), then
   ``dropDuplicates`` on (point_id, poly_id) because a polygon met through
   several cover cells must match once (GAIT dedups across region overlap the
   same way, DC_FreadFwrite* errors.c:1361).

The bbox prefilter before the exact kernel mirrors GAIT's minxvtx/maxxvtx
prefilter (share_linux.h:710) — Catalyst cannot see inside the UDF, so the
cheap reject is expressed as a JVM-side column predicate *before* the kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..functions.geometry import pip_ray_cast

#: grid cell width in degrees for the spatial hash; 1 deg ~ 111 km. Chosen per
#: dataset density by plans/partitioning.choose_cell_deg at scale.
DEFAULT_CELL_DEG = 4.0


def cell_id(ix: Column, iy: Column) -> Column:
    """Pack (ix, iy) grid indexes into one BIGINT shuffle key.

    Valid for |ix|, |iy| < 2^30 — i.e. any cell width >= ~1e-6 deg.
    """
    return (ix.cast("bigint") + F.lit(1073741824)) * F.lit(2147483648) + (
        iy.cast("bigint") + F.lit(1073741824)
    )


def with_point_cell(df: DataFrame, lon: str, lat: str, cell_deg: float) -> DataFrame:
    ix = F.floor(F.col(lon) / F.lit(cell_deg))
    iy = F.floor(F.col(lat) / F.lit(cell_deg))
    return df.withColumn("cell", cell_id(ix, iy))


def explode_bbox_cells(
    df: DataFrame,
    minx: str,
    maxx: str,
    miny: str,
    maxy: str,
    cell_deg: float,
) -> DataFrame:
    """One row per (feature, covered cell) — the duplicated build side."""
    ix0 = F.floor(F.col(minx) / F.lit(cell_deg))
    ix1 = F.floor(F.col(maxx) / F.lit(cell_deg))
    iy0 = F.floor(F.col(miny) / F.lit(cell_deg))
    iy1 = F.floor(F.col(maxy) / F.lit(cell_deg))
    return (
        df.withColumn("_ix", F.explode(F.sequence(ix0, ix1)))
        .withColumn("_iy", F.explode(F.sequence(iy0, iy1)))
        .withColumn("cell", cell_id(F.col("_ix"), F.col("_iy")))
        .drop("_ix", "_iy")
    )


@F.pandas_udf(BooleanType())
def _pip_udf(px: pd.Series, py: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
    if len(px) == 0:
        return pd.Series([], dtype=bool)
    return pd.Series(
        pip_ray_cast(px.to_numpy(), py.to_numpy(), xs.tolist(), ys.tolist()),
        index=px.index,
    )


def pip_join(
    points: DataFrame,
    polys: DataFrame,
    point_id: str = "point_id",
    lon: str = "lon",
    lat: str = "lat",
    poly_id: str = "poly_id",
    xs: str = "xs",
    ys: str = "ys",
    cell_deg: float = DEFAULT_CELL_DEG,
) -> DataFrame:
    """points (id, lon, lat, ...) x polys (id, xs: array, ys: array) -> matches.

    Returns one row per (point, containing polygon) with all point columns plus
    the polygon id.
    """
    polys_b = polys.select(
        F.col(poly_id),
        F.col(xs).alias("_pxs"),
        F.col(ys).alias("_pys"),
        F.array_min(xs).alias("_minx"),
        F.array_max(xs).alias("_maxx"),
        F.array_min(ys).alias("_miny"),
        F.array_max(ys).alias("_maxy"),
    )
    polys_cells = explode_bbox_cells(polys_b, "_minx", "_maxx", "_miny", "_maxy", cell_deg)
    pts_cells = with_point_cell(points, lon, lat, cell_deg)

    joined = pts_cells.join(polys_cells, "cell")
    # JVM-side bbox prefilter before the Arrow kernel (share_linux.h:710 analogue)
    joined = joined.filter(
        (F.col(lon) >= F.col("_minx"))
        & (F.col(lon) <= F.col("_maxx"))
        & (F.col(lat) >= F.col("_miny"))
        & (F.col(lat) <= F.col("_maxy"))
    )
    matched = joined.filter(_pip_udf(F.col(lon), F.col(lat), F.col("_pxs"), F.col("_pys")))
    return matched.drop("cell", "_pxs", "_pys", "_minx", "_maxx", "_miny", "_maxy").dropDuplicates(
        [point_id, poly_id]
    )
