"""Inspection-spec parser + role-gating integration."""

from __future__ import annotations

import pytest


SPEC_TEXT = """
# master inspection file (mini)
CHECK PTINREGION 1 on GEOM 1
INCLUDE PTINREGION 1 1 AL015 GB005
SENSITIVITY PTINREGION 1 2.5

CHECK PTPTPROX 1 on GEOM 1
EXCLUDE PTPTPROX 1 1 BH140
INCLUDE PTPTPROX 1 2 AP030

CHECK SLIVER 3 off GEOM 3
"""


def test_parse_inspection_spec():
    from geospatial_analysis_integrity_tool_spark.sources.inspection_spec import (
        parse_inspection_spec,
    )

    rows = {
        f"{r['check']}:{r['instance']}:{r['role']}": r
        for r in parse_inspection_spec(SPEC_TEXT)
    }
    assert rows["PTINREGION:1:1"]["fcodes_include"] == ["AL015", "GB005"]
    assert rows["PTINREGION:1:1"]["tol1"] == 2.5
    assert rows["PTINREGION:1:1"]["active"] is True
    assert rows["PTPTPROX:1:1"]["fcodes_exclude"] == ["BH140"]
    assert rows["PTPTPROX:1:2"]["fcodes_include"] == ["AP030"]
    assert rows["SLIVER:3:1"]["active"] is False


def test_bad_spec_raises():
    from geospatial_analysis_integrity_tool_spark.sources.inspection_spec import (
        parse_inspection_spec,
    )

    with pytest.raises(ValueError, match="line 1"):
        parse_inspection_spec("FROBNICATE X Y Z")


def test_spec_drives_role_gating(spark):
    from geospatial_analysis_integrity_tool_spark.operators.checkspec import apply_roles
    from geospatial_analysis_integrity_tool_spark.sources.inspection_spec import (
        load_inspection_spec,
    )

    spec = load_inspection_spec(spark, SPEC_TEXT)
    features = spark.createDataFrame(
        [(1, "AL015", 1), (2, "BH140", 1), (3, "AP030", 1), (4, "FA000", 3)],
        "feature_id long, fcode string, geom int",
    )
    got = {
        (r["check"], r.instance, r.role, r.feature_id)
        for r in apply_roles(features, spec).collect()
    }
    assert ("PTINREGION", 1, 1, 1) in got           # included fcode
    assert ("PTINREGION", 1, 1, 2) not in got       # not in include list
    assert ("PTPTPROX", 1, 1, 2) not in got         # excluded
    assert ("PTPTPROX", 1, 1, 1) in got             # no include list -> admitted
    assert ("PTPTPROX", 1, 2, 3) in got             # role-2 include
    assert not any(c == "SLIVER" for c, *_ in got)  # inactive check dropped
