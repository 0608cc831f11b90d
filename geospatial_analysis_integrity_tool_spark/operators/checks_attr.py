"""Attribute / schema-conformance checks — GAIT's ATTR_* family (SURVEY.md §2.9).

Reference semantics (TTformat.c CheckAssignedSAC, :26233-26412):

* ATTR_PAIR 223    — (fcode, geometry) pair not in the schema        (:26319)
* ATTR_PICK 222    — enum attribute value outside its domain         ({model}_enum.c)
* ATTR_RNG  224    — numeric value out of the spec range             (:26398 area)
* ATTR_MISSING 227 — required attribute absent                       (:26342)
* ATTR_UNEXP 226   — attribute the schema doesn't allow              (:26363)
* ATTR_DT   225    — datatype mismatch (non-numeric where numeric)   (:26398)

Spark-native shape: the schema tables are tiny broadcast DataFrames; every
check is a broadcast (anti-)join or a predicate — all JVM-side, whole-stage
codegen, zero UDFs.  At 100 TB the spec side is always broadcast (a few MB of
compiled schema in GAIT's case: {model}_class/_attr/_enum.c), so these checks
add no shuffle at all on the feature table.

Input is the long attribute form (feature_id, fcode, geom, attr, value) — the
relational twin of GAIT's ``long_attr_list`` (share_linux.h:898-919).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attr_conformance(
    attrs_long: DataFrame,
    spec_pairs: DataFrame,      # (fcode, geom)
    spec_attrs: DataFrame,      # (fcode, attr, required, datatype, low, high)
    spec_enums: DataFrame,      # (attr, value)
) -> DataFrame:
    """Run the ATTR_* family; returns (feature_id, errtype, attr, value).

    ``attrs_long`` must have one row per (feature, attribute) plus at least one
    row per feature (features with no attributes carry attr = NULL).
    """
    sp = F.broadcast(spec_pairs)
    sa = F.broadcast(spec_attrs)
    se = F.broadcast(spec_enums)

    feats = attrs_long.select("feature_id", "fcode", "geom").distinct()

    # ATTR_PAIR: observed (fcode, geom) not in schema
    attr_pair = (
        feats.join(sp, ["fcode", "geom"], "left_anti")
        .select(
            "feature_id",
            F.lit("ATTR_PAIR").alias("errtype"),
            F.lit(None).cast("string").alias("attr"),
            F.col("fcode").alias("value"),
        )
    )

    present = attrs_long.filter(F.col("attr").isNotNull())

    # ATTR_UNEXP: attribute not allowed for the feature's class
    attr_unexp = (
        present.join(sa.select("fcode", "attr"), ["fcode", "attr"], "left_anti")
        .select("feature_id", F.lit("ATTR_UNEXP").alias("errtype"), "attr", "value")
    )

    # ATTR_MISSING: required attribute absent
    required = sa.filter(F.col("required")).select("fcode", "attr")
    attr_missing = (
        feats.join(required, "fcode")
        .join(
            present.select("feature_id", "attr").withColumnRenamed("attr", "attr"),
            ["feature_id", "attr"],
            "left_anti",
        )
        .select(
            "feature_id",
            F.lit("ATTR_MISSING").alias("errtype"),
            "attr",
            F.lit(None).cast("string").alias("value"),
        )
    )

    # ATTR_PICK: enum-typed value outside its domain
    enum_attrs = se.select("attr").distinct()
    attr_pick = (
        present.join(enum_attrs, "attr")
        .join(se, ["attr", "value"], "left_anti")
        .select("feature_id", F.lit("ATTR_PICK").alias("errtype"), "attr", "value")
    )

    # ATTR_DT: numeric-typed attribute with a non-numeric value
    numeric_spec = sa.filter(F.col("datatype") == "int").select("fcode", "attr")
    with_num = present.join(numeric_spec, ["fcode", "attr"])
    attr_dt = with_num.filter(F.expr("try_cast(value AS BIGINT) IS NULL")).select(
        "feature_id", F.lit("ATTR_DT").alias("errtype"), "attr", "value"
    )

    # ATTR_RNG: numeric value outside [low, high]
    rng_spec = sa.filter(F.col("low").isNotNull()).select("fcode", "attr", "low", "high")
    attr_rng = (
        with_num.filter(F.expr("try_cast(value AS BIGINT) IS NOT NULL"))
        .join(rng_spec, ["fcode", "attr"])
        .filter(
            (F.expr("try_cast(value AS BIGINT)") < F.col("low"))
            | (F.expr("try_cast(value AS BIGINT)") > F.col("high"))
        )
        .select("feature_id", F.lit("ATTR_RNG").alias("errtype"), "attr", "value")
    )

    return (
        attr_pair.unionByName(attr_unexp)
        .unionByName(attr_missing)
        .unionByName(attr_pick)
        .unionByName(attr_dt)
        .unionByName(attr_rng)
    )
