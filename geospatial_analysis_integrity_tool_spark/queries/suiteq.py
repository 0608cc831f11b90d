"""Whole-suite composition gate.

``suite_family_counts`` runs the CheckRegion-style composition (suite.py —
every batch check family as ONE Spark DAG) and reports the per-family
condition count; the oracle is DuckDB running ALL of the same families'
gated oracle SQL unioned in one statement.  This gates the *composition*
itself — pre-union plan reuse, ANSI evaluation order across the combined
DAG (the round-5 DIVIDE_BY_ZERO class of bug), schema adapters — not just
each family in isolation.

Reference analogue: CheckRegion (SEEIT_API.c) runs every enabled check in
one invocation and reports per-condition-type totals in the summary file.

The registry entry is built by ``build(queries, oracles)`` from the
already-registered per-family entries, so the oracle text is exactly the
gated per-family SQL — no second transcription to drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build(registry: dict, oracles: dict) -> tuple[dict, dict]:
    from ..suite import SUITE_FAMILIES

    missing = [f for f in SUITE_FAMILIES if f not in oracles]
    assert not missing, f"suite families without oracles: {missing}"

    def suite_family_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
        # one agg per family (a 0-row family still emits its count row,
        # matching the oracle's scalar COUNT(*) subqueries), one union DAG
        parts = [
            registry[name](spark, sf_dir).agg(
                F.lit(name.upper()).alias("errtype"),
                F.count("*").cast("bigint").alias("n"),
            )
            for name in SUITE_FAMILIES
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    oracle = "\nUNION ALL\n".join(
        f"SELECT UPPER('{name}') AS errtype, CAST(COUNT(*) AS BIGINT) AS n"
        f" FROM (\n{oracles[name]}\n) AS sub_{i}"
        for i, name in enumerate(SUITE_FAMILIES)
    )
    return (
        {"suite_family_counts": suite_family_counts},
        {"suite_family_counts": oracle},
    )
