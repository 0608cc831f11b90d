"""Raster-tile <-> vector-cell overlay join — GAIT's grid check family.

Reference: DEM grids are flat elevation arrays with SW-corner + spacing
metadata (MultiGrids, share_linux.h:332-345); point-vs-grid checks sample the
post or bilinear surface under each vector feature (GetPointElevation
share_linux.h:965, InterpLinearElev :998; PT_GRID_DIF 198, GRIDEXACTDIF 197).

Spark-native shape: the raster is a **tiles table** ``(tile_id, tx, ty, x0,
y0, dx, dy, nx, ny, elevs array<double>)`` partitioned like any other cell
table; vector features compute their covering tile key with floor arithmetic
and equi-join (broadcast when the raster side is small, shuffled on tile key
otherwise).  Exact-post sampling is pure ``element_at`` — JVM-side, no UDF;
bilinear sampling is a vectorized kernel (numpy gather per Arrow batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlay_sample_exact(
    points: DataFrame,
    tiles: DataFrame,
    x_origin: float,
    y_origin: float,
    post_deg: float,
    posts_per_tile: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Join each point to its covering tile and read the exact post elevation.

    Adds columns gx, gy (global post indexes) and elev (sampled value).
    """
    p = (
        points.withColumn(
            "gx", F.expr(f"CAST(floor(({lon} - {x_origin}) / {post_deg}) AS BIGINT)")
        )
        .withColumn(
            "gy", F.expr(f"CAST(floor(({lat} - {y_origin}) / {post_deg}) AS BIGINT)")
        )
        # floor-division (not DIV, which truncates toward zero): points
        # south/west of the raster origin get negative gx/gy and must map to
        # tile -1, which the tiles join then drops — never a wrong tile.
        .withColumn(
            "tx",
            F.expr(f"CAST(floor(CAST(gx AS DOUBLE) / {posts_per_tile}) AS INT)"),
        )
        .withColumn(
            "ty",
            F.expr(f"CAST(floor(CAST(gy AS DOUBLE) / {posts_per_tile}) AS INT)"),
        )
    )
    joined = p.join(F.broadcast(tiles.select("tx", "ty", "elevs")), ["tx", "ty"])
    # pmod keeps in-tile offsets non-negative for any hemisphere
    idx = (
        f"(CAST(pmod(gy, {posts_per_tile}) AS INT) * {posts_per_tile}"
        f" + CAST(pmod(gx, {posts_per_tile}) AS INT))"
    )
    return joined.withColumn("elev", F.expr(f"element_at(elevs, {idx} + 1)")).drop(
        "elevs"
    )


def bilinear_sample_kernel(
    lon: np.ndarray,
    lat: np.ndarray,
    elevs: np.ndarray,  # (ny, nx) for ONE tile-mosaic window
    x0: float,
    y0: float,
    dx: float,
    dy: float,
) -> np.ndarray:
    """Vectorized bilinear interpolation (InterpLinearElev semantics)."""
    fx = (lon - x0) / dx
    fy = (lat - y0) / dy
    ix = np.clip(np.floor(fx).astype(np.int64), 0, elevs.shape[1] - 2)
    iy = np.clip(np.floor(fy).astype(np.int64), 0, elevs.shape[0] - 2)
    tx = fx - ix
    ty = fy - iy
    z00 = elevs[iy, ix]
    z10 = elevs[iy, ix + 1]
    z01 = elevs[iy + 1, ix]
    z11 = elevs[iy + 1, ix + 1]
    return (
        z00 * (1 - tx) * (1 - ty)
        + z10 * tx * (1 - ty)
        + z01 * (1 - tx) * ty
        + z11 * tx * ty
    )


def overlay_sample_bilinear(
    points: DataFrame,
    tiles: DataFrame,
    x_origin: float,
    y_origin: float,
    post_deg: float,
    posts_per_tile: int,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Bilinear variant: tile join + numpy gather kernel per Arrow batch.

    Interior-of-tile sampling only (points within half a post of a tile edge
    clamp to the edge cell — GAIT's edge handling is a separate check).
    """
    p = (
        points.withColumn(
            "tx",
            F.expr(
                f"CAST(floor(({lon} - {x_origin}) / ({post_deg} * {posts_per_tile})) AS INT)"
            ),
        )
        .withColumn(
            "ty",
            F.expr(
                f"CAST(floor(({lat} - {y_origin}) / ({post_deg} * {posts_per_tile})) AS INT)"
            ),
        )
    )
    joined = p.join(F.broadcast(tiles.select("tx", "ty", "x0", "y0", "elevs")), ["tx", "ty"])

    # pass-through all point columns + computed elev_bilin
    keep = [c for c in joined.columns if c != "elevs"]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in joined.schema.fields if f.name != "elevs"]
        + ["elev_bilin double"]
    )
    n = posts_per_tile

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.reset_index(drop=True)
            out = pdf[keep].copy()
            ev = np.zeros(len(pdf))
            for (x0v, y0v), grp in pdf.groupby(["x0", "y0"], sort=False):
                # all rows in the group share one tile raster
                E = np.asarray(grp["elevs"].iloc[0], dtype=np.float64).reshape(n, n)
                ev[grp.index.to_numpy()] = bilinear_sample_kernel(
                    grp[lon].to_numpy(),
                    grp[lat].to_numpy(),
                    E,
                    float(x0v),
                    float(y0v),
                    post_deg,
                    post_deg,
                )
            out["elev_bilin"] = ev
            yield out

    return joined.mapInPandas(run, schema=schema)
