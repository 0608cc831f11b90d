"""Iceberg table adapter (north rule: pages in, conditions out, as Iceberg).

The design point stores the page corpus and the condition output as Iceberg
tables: partition-level commits give the exactly-once resume the checkpoint
manifest provides here (plans/checkpointing.py documents the mapping), and
hidden partitioning on the tile cell serves the same partition pruning
tests/test_plans.py proves on the parquet layout.

This sandbox ships no Iceberg runtime jars, so the adapter is honest about
it: ``iceberg_available`` probes the JVM for the SparkCatalog class, the
writers/readers use Iceberg's SQL surface (``writeTo(...).using("iceberg")``,
catalog table reads) when present, and otherwise degrade to the
cell-partitioned parquet layout that the rest of the engine already uses —
SAME schema, SAME partition column, so a deployment with Iceberg configured
changes only the table identifier, not the plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _is_table_ref(ref: str) -> bool:
    # catalog.db.table identifiers have no path separators
    return "/" not in ref and "\\" not in ref


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read a pages/features/conditions table.

    ``ref`` is an Iceberg table identifier (``catalog.db.pages``) when the
    runtime has Iceberg, else a parquet directory path.
    """
    if _is_table_ref(ref):
        if not iceberg_available(spark):
            raise RuntimeError(
                f"{ref!r} looks like a catalog table but no Iceberg runtime "
                "is on the classpath; pass a parquet path instead"
            )
        return spark.table(ref)
    return spark.read.parquet(ref)


def write_partitioned(
    df: DataFrame,
    ref: str,
    partition_col: str,
    mode: str = "overwrite_partitions",
) -> None:
    """Write partitioned by the tile cell, exactly-once per partition.

    Iceberg path: ``overwritePartitions`` (dynamic partition-level commit —
    the cluster-grade form of the manifest's resume contract).  Parquet
    fallback: dynamic partition overwrite, identical semantics at the
    directory level.
    """
    if _is_table_ref(ref):
        spark = df.sparkSession
        if not iceberg_available(spark):
            raise RuntimeError(
                f"{ref!r} looks like a catalog table but no Iceberg runtime "
                "is on the classpath; pass a parquet path instead"
            )
        writer = df.writeTo(ref).using("iceberg")
        if mode == "overwrite_partitions":
            writer.createOrReplace() if not spark.catalog.tableExists(
                ref
            ) else writer.overwritePartitions()
        else:
            writer.append()
        return
    (
        df.repartition(df[partition_col])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(ref)
    )
