"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (PIP spatial hash join) on sf0.001.
``queries()``   — every implemented operator, one callable per name.
``oracle_sql()``— DuckDB-equivalent SQL per name (the correctness gate).

Implementation lives in ``geospatial_analysis_integrity_tool_spark/``; this file
only aggregates the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geospatial_analysis_integrity_tool_spark.queries import all_queries

_QUERIES, _ORACLES = all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-in-polygon spatial hash join + ray-cast refine."""
    return _QUERIES["geo_pip"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
