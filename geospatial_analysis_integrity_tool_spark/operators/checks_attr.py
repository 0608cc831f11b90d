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

    Physical shape (single-pass): the original formulation ran SIX separate
    (anti-)join legs unioned together — correct, but the 6-leg plan paid
    ~9 s of one-time whole-stage-codegen compilation and re-derived the
    feature header / present set per leg.  This version makes exactly TWO
    passes over ``attrs_long``:

    * one aggregation keyed by the feature header that carries the present
      attr set, from which ATTR_PAIR (broadcast pair-spec left join) and
      ATTR_MISSING (``array_except`` against the broadcast per-class
      required-attr array) fall out, and
    * one pass over present rows with two broadcast left joins (attr spec,
      enum domain), emitting ATTR_UNEXP / ATTR_PICK / ATTR_DT / ATTR_RNG
      from a concat-of-conditional-arrays + ``explode`` — a present row CAN
      legitimately carry two errors (e.g. UNEXP and PICK), exactly as the
      independent legs did.

    Row-identical to the 6-leg version; at sf0.1 cold 13 -> 10 s (codegen
    still dominates the first call) and warm 4.3 -> 2.6 s (same-session A/B).
    """
    sp = F.broadcast(spec_pairs.withColumn("_pair_ok", F.lit(1)))
    # per-class required-attr arrays (broadcast; spec tables are tiny)
    req_arrays = F.broadcast(
        spec_attrs.filter(F.col("required"))
        .groupBy("fcode")
        .agg(F.collect_set("attr").alias("_req"))
    )
    sa = F.broadcast(
        spec_attrs.select("fcode", "attr", "datatype", "low", "high")
        .withColumn("_sa_ok", F.lit(1))
    )
    enum_attrs = F.broadcast(
        spec_enums.select("attr").distinct().withColumn("_enum_attr", F.lit(1))
    )
    se = F.broadcast(spec_enums.withColumn("_in_enum", F.lit(1)))

    # pass 1: feature headers + present-attr set in ONE aggregation
    per_feat = attrs_long.groupBy("feature_id", "fcode", "geom").agg(
        F.collect_set("attr").alias("_attrs")  # collect_set drops the NULL rows
    )
    feat_errs = (
        per_feat.join(sp, ["fcode", "geom"], "left")
        .join(req_arrays, "fcode", "left")
        .select(
            "feature_id",
            "fcode",
            F.explode(
                F.concat(
                    F.when(
                        F.col("_pair_ok").isNull(),
                        F.expr(
                            "array(named_struct('errtype', 'ATTR_PAIR',"
                            " 'attr', CAST(NULL AS STRING), 'value', fcode))"
                        ),
                    ).otherwise(F.expr("array()")),
                    F.expr(
                        "transform(array_sort(array_except(coalesce(_req, array()),"
                        " _attrs)), a -> named_struct('errtype', 'ATTR_MISSING',"
                        " 'attr', a, 'value', CAST(NULL AS STRING)))"
                    ),
                )
            ).alias("_e"),
        )
        .select("feature_id", "_e.errtype", "_e.attr", "_e.value")
    )

    # pass 2: present rows, two broadcast left joins, conditional error array
    present = attrs_long.filter(F.col("attr").isNotNull())
    row_errs = (
        present.join(sa, ["fcode", "attr"], "left")
        .join(enum_attrs, "attr", "left")
        .join(se, ["attr", "value"], "left")
        .withColumn("_v", F.expr("try_cast(value AS BIGINT)"))
        .select(
            "feature_id",
            F.explode(
                F.concat(
                    F.when(
                        F.col("_sa_ok").isNull(),
                        F.expr(
                            "array(named_struct('errtype', 'ATTR_UNEXP',"
                            " 'attr', attr, 'value', value))"
                        ),
                    ).otherwise(F.expr("array()")),
                    F.when(
                        (F.col("_enum_attr") == 1) & F.col("_in_enum").isNull(),
                        F.expr(
                            "array(named_struct('errtype', 'ATTR_PICK',"
                            " 'attr', attr, 'value', value))"
                        ),
                    ).otherwise(F.expr("array()")),
                    F.when(
                        (F.col("datatype") == "int") & F.col("_v").isNull(),
                        F.expr(
                            "array(named_struct('errtype', 'ATTR_DT',"
                            " 'attr', attr, 'value', value))"
                        ),
                    ).otherwise(F.expr("array()")),
                    F.when(
                        (F.col("datatype") == "int")
                        & F.col("_v").isNotNull()
                        & F.col("low").isNotNull()
                        & ((F.col("_v") < F.col("low")) | (F.col("_v") > F.col("high"))),
                        F.expr(
                            "array(named_struct('errtype', 'ATTR_RNG',"
                            " 'attr', attr, 'value', value))"
                        ),
                    ).otherwise(F.expr("array()")),
                )
            ).alias("_e"),
        )
        .select("feature_id", "_e.errtype", "_e.attr", "_e.value")
    )

    return feat_errs.unionByName(row_errs)


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
