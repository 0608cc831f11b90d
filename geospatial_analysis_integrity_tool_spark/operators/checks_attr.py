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


def attr_extended(
    attrs_long: DataFrame,
    spec_attrs: DataFrame,      # (fcode, attr, required, datatype, low, high)
    nunanpo: DataFrame,         # (value) — Null/Unknown/NotApplicable/... sentinels
    meta_rules: DataFrame,      # (attr, kind, low, high, exact_len)
    portray_rules: DataFrame,   # (fcode, attr, value) — portrayable combos
    reported: DataFrame,        # (feature_id, attr, message) — extract-phase errors
) -> DataFrame:
    """The remaining §2.9 checks; returns (feature_id, errtype, attr, value).

    * ATTR_RNULL 229 — required attribute populated with a NUNANPO sentinel
      ({model}_nunanpo_enum.c tables; sentinel handling TTformat.c:26342-26412,
      TT.c:1625).
    * ATTR_META 228 — metadata attribute violations (GIFD rules,
      gifd_functionality.c): numeric ranges and identifier length.
    * PORTRAYF 219 — feature matches NO portrayal rule (rule-set anti-join;
      errors.c case comments).
    * RPTD_ATTR 218 — pass-through of attribution errors reported by the
      extract phase (TT.c:44129-44183 AttrErr read).

    Same physical shape as attr_conformance: every rule table broadcasts;
    zero UDFs, zero extra shuffles on the feature side.
    """
    sa = F.broadcast(spec_attrs)
    nn = F.broadcast(nunanpo)
    mr = F.broadcast(meta_rules)
    pr = F.broadcast(portray_rules)

    present = attrs_long.filter(F.col("attr").isNotNull())
    feats = attrs_long.select("feature_id", "fcode", "geom").distinct()

    required = sa.filter(F.col("required")).select("fcode", "attr")
    attr_rnull = (
        present.join(required, ["fcode", "attr"])
        .join(nn, "value")
        .select("feature_id", F.lit("ATTR_RNULL").alias("errtype"), "attr", "value")
    )

    with_meta = present.join(mr, "attr")
    meta_range = with_meta.filter(F.col("kind") == "range").filter(
        F.expr("try_cast(value AS BIGINT) IS NULL")
        | (F.expr("try_cast(value AS BIGINT)") < F.col("low"))
        | (F.expr("try_cast(value AS BIGINT)") > F.col("high"))
    )
    meta_len = with_meta.filter(F.col("kind") == "len").filter(
        F.length("value") != F.col("exact_len")
    )
    attr_meta = meta_range.unionByName(meta_len).select(
        "feature_id", F.lit("ATTR_META").alias("errtype"), "attr", "value"
    )

    portrayable = (
        present.join(pr, ["fcode", "attr", "value"])
        .select("feature_id")
        .distinct()
    )
    portrayf = feats.join(portrayable, "feature_id", "left_anti").select(
        "feature_id",
        F.lit("PORTRAYF").alias("errtype"),
        F.lit(None).cast("string").alias("attr"),
        F.col("fcode").alias("value"),
    )

    rptd = reported.select(
        "feature_id", F.lit("RPTD_ATTR").alias("errtype"), "attr",
        F.col("message").alias("value"),
    )

    return (
        attr_rnull.unionByName(attr_meta).unionByName(portrayf).unionByName(rptd)
    )
