"""The Iceberg adapter's contract in a no-Iceberg sandbox: probe says no,
catalog refs are rejected loudly, and the parquet fallback round-trips with
the same partition layout the engine uses everywhere."""

from __future__ import annotations

import pytest


def test_probe_and_fallback(spark, tmp_path):
    from pyspark.sql import functions as F

    from geospatial_analysis_integrity_tool_spark.sources.iceberg import (
        iceberg_available,
        read_table,
        write_partitioned,
    )

    assert iceberg_available(spark) is False  # sandbox ships no iceberg jars

    with pytest.raises(RuntimeError):
        read_table(spark, "catalog.db.pages")

    df = spark.range(0, 100).select(
        F.col("id").alias("feature_id"), (F.col("id") % 4).alias("cell")
    )
    out = str(tmp_path / "conds")
    write_partitioned(df, out, "cell")
    back = read_table(spark, out)
    assert back.count() == 100
    # partition layout identical to the engine's checkpoint sink
    assert back.filter("cell = 2").count() == 25
    # dynamic overwrite: rewriting one partition leaves the others intact
    write_partitioned(df.filter("cell = 2"), out, "cell")
    assert read_table(spark, out).count() == 100
