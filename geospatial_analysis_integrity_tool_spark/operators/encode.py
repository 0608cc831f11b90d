"""Cell-encode stage: features -> H3-style res-7..12 and S2 level-10..16 ids.

The north star's encode contract: a *batched cell-encode kernel* (Arrow
pandas UDFs over whole columns — never per-row Python) producing deterministic
tile assignments, identical across runs and parallelism levels.

The ids become partition/shuffle keys for every downstream check join; at
100 TB the parquet/Iceberg layout is partitioned by a mid-resolution cell
(hex res 7 / s2 level 10) so partition pruning serves the spatially-scoped
reads GAIT does with its per-region file index (TTformat.c:28616-28655).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..functions.cells_hex import hex_cell
from ..functions.cells_s2 import cell_id_from_lat_lng

HEX_RES_RANGE = tuple(range(7, 13))  # north rule: H3 res 7..12
S2_LEVEL_RANGE = tuple(range(10, 17))  # north rule: S2 level 10..16


def _cells_udf(hex_res: tuple[int, ...], s2_levels: tuple[int, ...]):
    """ONE Arrow kernel emitting every requested cell id as a struct — the
    lat/lon batch crosses the Python boundary once, not once per scale."""
    names = [f"hex_r{r}" for r in hex_res] + [f"s2_l{lv}" for lv in s2_levels]
    schema = StructType([StructField(n, LongType()) for n in names])

    @F.pandas_udf(schema)
    def f(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        la, lo = lat.to_numpy(), lon.to_numpy()
        data = {f"hex_r{r}": hex_cell(la, lo, r) for r in hex_res}
        data.update(
            {f"s2_l{lv}": cell_id_from_lat_lng(la, lo, lv) for lv in s2_levels}
        )
        return pd.DataFrame(data, index=lat.index)

    return f, names


def encode_cells(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    hex_res: tuple[int, ...] = HEX_RES_RANGE,
    s2_levels: tuple[int, ...] = S2_LEVEL_RANGE,
) -> DataFrame:
    """Add hex_r{res} and s2_l{level} id columns for every requested scale."""
    udf, names = _cells_udf(hex_res, s2_levels)
    df = df.withColumn("_cells", udf(F.col(lat), F.col(lon)))
    for n in names:
        df = df.withColumn(n, F.col(f"_cells.{n}"))
    return df.drop("_cells")
