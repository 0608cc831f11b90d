"""Bucketed co-located joins: the zero-shuffle strategy for repeated joins
on the same key (SURVEY.md §4 — pre-partitioning reused across stages).

At 100 TB the features table is bucketed by cell/feature key once at write
time; every later join on that key then runs with NO Exchange on either
side.  Verified structurally: the physical plan of bucketed ⋈ bucketed has
zero Exchange nodes, while the same join over plain parquet shuffles.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse_tables(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS feats_bucketed")
    spark.sql("DROP TABLE IF EXISTS attrs_bucketed")
    feats = spark.range(10_000).selectExpr(
        "id AS feature_id", "CAST(id % 97 AS INT) AS cell"
    )
    attrs = spark.range(10_000).selectExpr(
        "id AS feature_id", "CAST(id % 7 AS INT) AS code"
    )
    (
        feats.write.mode("overwrite")
        .bucketBy(8, "feature_id").sortBy("feature_id")
        .saveAsTable("feats_bucketed")
    )
    (
        attrs.write.mode("overwrite")
        .bucketBy(8, "feature_id").sortBy("feature_id")
        .saveAsTable("attrs_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS feats_bucketed")
    spark.sql("DROP TABLE IF EXISTS attrs_bucketed")


def test_bucketed_join_has_no_exchange(spark, warehouse_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("feats_bucketed").join(
            spark.table("attrs_bucketed"), "feature_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert joined.count() == 10_000

        # control: the same join over non-bucketed data DOES shuffle
        plain_a = spark.range(10_000).selectExpr("id AS feature_id")
        plain_b = spark.range(10_000).selectExpr("id AS feature_id")
        control = plain_a.join(plain_b, "feature_id")
        cplan = control._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in cplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
