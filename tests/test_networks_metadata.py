"""Connected components + metadata XML validator goldens."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_connected_components_two_clusters(spark):
    from geospatial_analysis_integrity_tool_spark.operators.networks import (
        component_stats,
        connected_components,
    )

    # chain 1-2-3 (shared endpoints), isolated line 4
    lines = spark.createDataFrame(
        [
            (1, 0.0, 0.0, 1.0, 1.0),
            (2, 1.0, 1.0, 2.0, 2.0),
            (3, 2.0, 2.0, 3.0, 3.0),
            (4, 9.0, 9.0, 8.0, 8.0),
        ],
        "line_id long, x1 double, y1 double, x3 double, y3 double",
    )
    comp = connected_components(lines)
    got = {r.line_id: r.component_id for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}
    sizes = {r.component_id: r.n_lines for r in component_stats(comp).collect()}
    assert sizes == {1: 3, 4: 1}


def test_metadata_xml_planted_violations(spark):
    from geospatial_analysis_integrity_tool_spark.sources.metadata_xml import (
        validate_metadata_xml,
    )

    xml_df = spark.createDataFrame(
        [
            (1, "<cell><country>USA</country><edition>3</edition>"
                "<date>2024-05-10</date><security>U</security></cell>"),
            (2, "<cell><country>XXZ</country><edition>99</edition>"
                "<date>2024-13-10</date><security>Q</security></cell>"),
        ],
        "cell_key long, xml string",
    )
    out = validate_metadata_xml(xml_df).collect()
    errs = {(r.cell_key, r.errtype) for r in out}
    assert (1, "META_TRIGRAPH") not in errs
    assert {(2, "META_TRIGRAPH"), (2, "META_EDITION_RNG"), (2, "META_DATE"),
            (2, "META_SECURITY")} <= errs
    assert not any(k == 1 for k, _ in errs)


def test_cc_long_path_converges_via_doubling(spark):
    """A 400-line chain (diameter 400) must converge — plain one-hop
    propagation with 20 rounds returned wrong labels here."""
    from geospatial_analysis_integrity_tool_spark.operators.networks import (
        connected_components,
    )

    n = 400
    rows = [
        (i, 10.0 + i / 1000.0, 40.0, 10.0 + (i + 1) / 1000.0, 40.0)
        for i in range(n)
    ]
    lines = spark.createDataFrame(
        rows, "line_id long, x1 double, y1 double, x3 double, y3 double"
    )
    comp = connected_components(lines).collect()
    assert len(comp) == n
    assert {r.component_id for r in comp} == {0}


def test_cc_raises_on_exhausted_iterations(spark):
    import pytest as _pytest

    from geospatial_analysis_integrity_tool_spark.operators.networks import (
        connected_components,
    )

    rows = [
        (i, 10.0 + i / 1000.0, 40.0, 10.0 + (i + 1) / 1000.0, 40.0)
        for i in range(64)
    ]
    lines = spark.createDataFrame(
        rows, "line_id long, x1 double, y1 double, x3 double, y3 double"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(lines, max_iter=2)
