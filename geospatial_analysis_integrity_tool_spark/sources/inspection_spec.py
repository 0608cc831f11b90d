"""Inspection-spec (master check file) parser — GAIT's declarative query
language.

Reference grammar (interface.c:9020-9027, consumed by DoBatchEDCSStuff
:8895 and ApplyExecutionOptions :6979): one directive per line,

    CHECKNAME instance AXIS CLASSNAME VALARG on|off GEOM

where AXIS selects what CLASSNAME/VALARG mean (participant include/exclude
feature codes, sensitivity values, geometry applicability).  This module
parses a practical subset into the engine's broadcast check-spec rows
(operators/checkspec.CHECKSPEC_SCHEMA):

    CHECK <name> <instance> on|off GEOM <1|2|3>
    INCLUDE <name> <instance> <role> <fcode> [fcode ...]
    EXCLUDE <name> <instance> <role> <fcode> [fcode ...]
    SENSITIVITY <name> <instance> <tol>

Lines starting with '#' and blank lines are ignored.  Unknown directives
raise (a bad master file should fail loudly, like GAIT's exit(-1) paths).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..operators.checkspec import CHECKSPEC_SCHEMA


@dataclass
class _SpecRow:
    check: str
    instance: int
    role: int = 1
    geom: int = 1
    fcodes_include: list[str] = field(default_factory=list)
    fcodes_exclude: list[str] = field(default_factory=list)
    tol1: float = 0.0
    active: bool = True


def parse_inspection_spec(text: str) -> list[dict]:
    """Spec text -> list of CHECKSPEC_SCHEMA-shaped dicts."""
    rows: dict[tuple[str, int, int], _SpecRow] = {}

    def row(check: str, instance: int, role: int = 1) -> _SpecRow:
        key = (check, instance, role)
        if key not in rows:
            rows[key] = _SpecRow(check=check, instance=instance, role=role)
        return rows[key]

    for lineno, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        directive = parts[0].upper()
        try:
            if directive == "CHECK":
                name, inst, onoff, _geom_kw, geom = (
                    parts[1], int(parts[2]), parts[3].lower(), parts[4], int(parts[5]),
                )
                r = row(name, inst)
                r.active = onoff == "on"
                r.geom = geom
            elif directive in ("INCLUDE", "EXCLUDE"):
                name, inst, role = parts[1], int(parts[2]), int(parts[3])
                r = row(name, inst, role)
                target = (
                    r.fcodes_include if directive == "INCLUDE" else r.fcodes_exclude
                )
                target.extend(parts[4:])
                # roles inherit the check-level geom/active set by CHECK
                base = rows.get((name, inst, 1))
                if base is not None and role != 1:
                    r.geom = base.geom
                    r.active = base.active
                    r.tol1 = base.tol1
            elif directive == "SENSITIVITY":
                name, inst, tol = parts[1], int(parts[2]), float(parts[3])
                for (n, i, _), r in rows.items():
                    if n == name and i == inst:
                        r.tol1 = tol
                if (name, inst, 1) not in rows:
                    row(name, inst).tol1 = tol
            else:
                raise ValueError(f"unknown directive {directive!r}")
        except (IndexError, ValueError) as e:
            raise ValueError(f"inspection spec line {lineno}: {raw!r}: {e}") from e

    return [
        {
            "check": r.check,
            "instance": r.instance,
            "role": r.role,
            "geom": r.geom,
            "fcodes_include": r.fcodes_include,
            "fcodes_exclude": r.fcodes_exclude,
            "tol1": r.tol1,
            "active": r.active,
        }
        for r in rows.values()
    ]


def load_inspection_spec(spark: SparkSession, text: str) -> DataFrame:
    """Spec text -> broadcastable spec DataFrame (CHECKSPEC_SCHEMA)."""
    return spark.createDataFrame(
        [tuple(d.values()) for d in parse_inspection_spec(text)], CHECKSPEC_SCHEMA
    )
