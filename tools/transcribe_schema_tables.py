"""Transcribe the reference's public schema dimension tables into Python
data modules (run once; the emitted modules are committed, this tool is the
reproducible provenance).

Sources (MIT-licensed public data under ``/root/reference/GAIT 26 Source``):

* ``tds_illegals.c``   — TDS4_ISF_Headers[225] + the 225x225 'n/e/g/w'
  illegal-structure-formation matrix (consumed by interface2.c:8059).
* ``tds6_class.c``     — TDS6_class_codes[321].
* ``tds6_attr.c``      — TDS6_attr_codes[552] + TDS6_attr_types[552].
* ``tds6_enum.c``      — TDS6_enum_codes[7675] +
  TDS6_attr_enum_count/start[552] (per-attribute slices).

Emits:

* ``geospatial_analysis_integrity_tool_spark/functions/tds_isf_table.py`` — headers + the matrix
  as ONE 50,625-char string (row-major, ``matrix[i*225+j]``), the layout
  the C consumer indexes directly.
* ``geospatial_analysis_integrity_tool_spark/functions/tds6_tables.py`` — class codes, attr
  codes/types, attr->enum-values dict (same shape as mgcp3_tables.py).
"""

from __future__ import annotations

import os
import re
from pathlib import Path

REF = Path(os.environ.get("GAIT_REFERENCE_DIR", "/root/reference/GAIT 26 Source"))
OUT = Path(__file__).resolve().parent.parent / "geospatial_analysis_integrity_tool_spark" / "functions"


def _array_block(text: str, name: str) -> str:
    m = re.search(re.escape(name) + r"\s*\[[^\]]*\]\s*=\s*\{", text)
    if not m:
        raise LookupError(name)
    end = text.index("};", m.end())
    return text[m.end() : end]


def parse_string_array(text: str, name: str) -> list[str]:
    block = _array_block(text, name)
    return re.findall(r'"((?:[^"\\]|\\.)*)"', block)


def parse_char_array(text: str, name: str) -> str:
    block = _array_block(text, name)
    return "".join(re.findall(r"'(.)'", block))


def parse_int_array(text: str, name: str) -> list[int]:
    block = _array_block(text, name)
    block = re.sub(r"/\*.*?\*/", "", block, flags=re.S)
    return [int(v) for v in re.findall(r"-?\d+", block)]


def emit_isf() -> None:
    text = (REF / "tds_illegals.c").read_text(errors="replace")
    headers = parse_string_array(text, "TDS4_ISF_Headers")
    matrix = parse_char_array(text, "TDS4_ISF")
    headers6 = parse_string_array(text, "TDS6_ISF_Headers")
    matrix6 = parse_char_array(text, "TDS6_ISF")
    n = len(headers)
    n6 = len(headers6)
    assert len(matrix) == n * n, (len(headers), len(matrix))
    assert set(matrix) <= set("negw")
    assert len(matrix6) == n6 * n6 and set(matrix6) <= set("negw")

    def _hdr_lines(hs, k):
        return ",\n    ".join(
            ", ".join(f"'{h}'" for h in hs[i : i + 10]) for i in range(0, k, 10)
        )

    def _mat_lines(m, k):
        return "\n    ".join(f'"{m[i:i + k]}"' for i in range(0, k * k, k))

    out = f'''"""TDS illegal-structure-formation (ISF) matrices at REAL size.

Transcribed from the reference's MIT-licensed public data table
(tds_illegals.c:16-60 ``TDS4_ISF_Headers[225]`` + the 225x225 ``TDS4_ISF``
cell matrix; :259-269 ``TDS6_ISF_Headers[228]`` + the 228x228 ``TDS6_ISF``;
consumed row-major as ``TDS_ISF[k*N + j]`` in interface2.c:8051-8075 —
the active model selects which pair, interface2.c:327ff).  Cell codes:
'n' = not applicable (lower triangle — the matrices are upper-triangular),
'e'/'w' = the class pair triggers an error / warning structure check,
'g' = pair allowed.

Pure data, no logic.  Each matrix is ONE string indexed
``MATRIX[i * N + j]`` — exactly the C layout, so both the Spark plan and
the DuckDB oracle can read cells with ``substring()`` instead of joining
an N x N pair table.
"""

ISF_N = {n}

ISF_HEADERS = [
    {_hdr_lines(headers, n)},
]

ISF_MATRIX = (
    {_mat_lines(matrix, n)}
)

ISF6_N = {n6}

ISF6_HEADERS = [
    {_hdr_lines(headers6, n6)},
]

ISF6_MATRIX = (
    {_mat_lines(matrix6, n6)}
)

assert len(ISF_HEADERS) == ISF_N
assert len(ISF_MATRIX) == ISF_N * ISF_N
assert len(ISF6_HEADERS) == ISF6_N
assert len(ISF6_MATRIX) == ISF6_N * ISF6_N
'''
    (OUT / "tds_isf_table.py").write_text(out)
    counts = {c: matrix.count(c) for c in "negw"}
    counts6 = {c: matrix6.count(c) for c in "negw"}
    print("tds_isf_table.py:", n, "+", n6, "headers,", counts, counts6)


def emit_tds6() -> None:
    ctext = (REF / "tds6_class.c").read_text(errors="replace")
    atext = (REF / "tds6_attr.c").read_text(errors="replace")
    etext = (REF / "tds6_enum.c").read_text(errors="replace")
    classes = parse_string_array(ctext, "TDS6_class_codes")
    attrs = parse_string_array(atext, "TDS6_attr_codes")
    types = parse_string_array(atext, "TDS6_attr_types")
    enum_codes = parse_string_array(etext, "TDS6_enum_codes")
    counts = parse_int_array(etext, "TDS6_attr_enum_count")
    starts = parse_int_array(etext, "TDS6_attr_enum_start")
    assert len(attrs) == len(types) == len(counts) == len(starts)
    enums: dict[str, list[str]] = {}
    for a, c, s in zip(attrs, counts, starts):
        if c > 0 and s >= 0:
            enums[a] = enum_codes[s : s + c]
    out = f'''"""TDS 6.x schema tables at REAL size ({len(classes)} feature classes,
{len(attrs)} attributes, {len(enum_codes)} enum rows -> {len(enums)} enumerated attributes).

Transcribed from the reference's MIT-licensed public data tables
(tds6_class.c:21 TDS6_class_codes; tds6_attr.c:20 TDS6_attr_codes /
:1130 TDS6_attr_types; tds6_enum.c:20 TDS6_enum_codes +
:15376 TDS6_attr_enum_count / :15931 TDS6_attr_enum_start).
Pure data, no logic — the second full-size domain volume (after MGCP
TRD3, functions/mgcp3_tables.py) for the ATTR_* conformance family.
"""

CLASS_CODES = {classes!r}

ATTR_CODES = {attrs!r}

ATTR_TYPES = {types!r}

ATTR_ENUMS = {enums!r}
'''
    (OUT / "tds6_tables.py").write_text(out)
    print(
        "tds6_tables.py:",
        len(classes), "classes,", len(attrs), "attrs,",
        sum(len(v) for v in enums.values()), "enum values over",
        len(enums), "attrs",
    )


def emit_labels() -> None:
    """ECC/EAC label tables (GetECCLabel/GetEACLabel, share_linux.h:1066;
    gifd_functionality.c:83/:107 index the active model's class/attr NAME
    arrays) — emitted as code->name dicts per model."""
    pairs = {}
    for model, cfile, afile, prefix in (
        ("MGCP3", "mgcp3_class.c", "mgcp3_attr.c", "MGCP3"),
        ("TDS6", "tds6_class.c", "tds6_attr.c", "TDS6"),
    ):
        ctext = (REF / cfile).read_text(errors="replace")
        atext = (REF / afile).read_text(errors="replace")
        ccodes = parse_string_array(ctext, f"{prefix}_class_codes")
        cnames = parse_string_array(ctext, f"{prefix}_class_names")
        acodes = parse_string_array(atext, f"{prefix}_attr_codes")
        anames = parse_string_array(atext, f"{prefix}_attr_names")
        assert len(ccodes) == len(cnames) and len(acodes) == len(anames)
        pairs[model] = {
            "class": dict(zip(ccodes, cnames)),
            "attr": dict(zip(acodes, anames)),
        }
    out = f'''"""ECC/EAC human-readable label tables (condition-report LABEL1/LABEL2).

Transcribed from the reference's MIT-licensed public data tables: the
class/attr NAME arrays the ``GetECCLabel``/``GetEACLabel`` accessors index
(share_linux.h:1066-1085; gifd_functionality.c:83,:107; mgcp3_class.c:209
MGCP3_class_names; mgcp3_attr.c:192 MGCP3_attr_names; tds6_class.c:345
TDS6_class_names; tds6_attr.c:575 TDS6_attr_names).  Pure data keyed by
code (order-independent), per schema model.
"""

LABELS = {pairs!r}


def ecc_label(model: str, fcode: str) -> str:
    """Class label for a feature code (GetECCLabel semantics: unknown code
    -> 'Error', the reference's out-of-range convention)."""
    return LABELS.get(model, {{}}).get("class", {{}}).get(fcode, "Error")


def eac_label(model: str, attr: str) -> str:
    """Attribute label for an attr code (GetEACLabel semantics)."""
    return LABELS.get(model, {{}}).get("attr", {{}}).get(attr, "Error")
'''
    (OUT / "schema_labels.py").write_text(out)
    for model, t in pairs.items():
        print(
            f"schema_labels.py[{model}]:",
            len(t["class"]), "class labels,", len(t["attr"]), "attr labels",
        )


#: every schema model in the reference with the standard array layout:
#: model key -> (file stem, C array prefix)
ALL_MODELS = {
    "D4": ("d4", "D4"),
    "DFDD": ("dfdd", "DFDD"),
    "FLDB": ("fldb", "FLDB"),
    "GGDM21": ("ggdm21", "GGDM21"),
    "GGDM22_U": ("ggdm22_u", "GGDM22_U"),
    "GGDM3": ("ggdm3", "GGDM3"),
    "GIFD": ("gifd", "gifd"),
    "MGCP3": ("mgcp3", "MGCP3"),
    "MGCP4": ("mgcp4", "MGCP4"),
    "NFDD": ("nfdd", "NFDD"),
    "SAC": ("sac", "SAC"),
    "TDS4": ("tds4", "TDS4"),
    "TDS6": ("tds6", "TDS6"),
    "UFD1": ("ufd1", "UFD1"),
    "UFD2": ("ufd2", "UFD2"),
    "UFD3": ("ufd3", "UFD3"),
}


def emit_all_models() -> None:
    """ALL 16 schema models' class/attr/type/enum tables + labels into one
    JSON data file (the '~440K LoC of dimension tables' gap from the
    round-3 verdict; every {model}_class.c / _attr.c / _enum.c follows the
    same array layout the MGCP3/TDS6 transcriptions used)."""
    import json

    out: dict[str, dict] = {}
    for model, (stem, prefix) in ALL_MODELS.items():
        ctext = (REF / f"{stem}_class.c").read_text(errors="replace")
        atext = (REF / f"{stem}_attr.c").read_text(errors="replace")
        etext = (REF / f"{stem}_enum.c").read_text(errors="replace")
        classes = parse_string_array(ctext, f"{prefix}_class_codes")
        cnames = parse_string_array(ctext, f"{prefix}_class_names")
        attrs = parse_string_array(atext, f"{prefix}_attr_codes")
        anames = parse_string_array(atext, f"{prefix}_attr_names")
        types = parse_string_array(atext, f"{prefix}_attr_types")
        enum_codes = parse_string_array(etext, f"{prefix}_enum_codes")
        enum_names = parse_string_array(etext, f"{prefix}_enum_names")
        counts = parse_int_array(etext, f"{prefix}_attr_enum_count")
        starts = parse_int_array(etext, f"{prefix}_attr_enum_start")
        assert len(classes) == len(cnames), model
        assert len(attrs) == len(anames) == len(types), model
        assert len(counts) == len(starts) == len(attrs), (
            model, len(counts), len(starts), len(attrs)
        )
        assert len(enum_names) == len(enum_codes), model
        enums = {
            a: enum_codes[s : s + c]
            for a, c, s in zip(attrs, counts, starts)
            if c > 0 and 0 <= s and s + c <= len(enum_codes)
        }
        # GetEELabel (share_linux.h:1080; gifd_functionality.c:121): the
        # enum NAME at the same slice index as the code
        enum_labels = {
            a: enum_names[s : s + c]
            for a, c, s in zip(attrs, counts, starts)
            if c > 0 and 0 <= s and s + c <= len(enum_codes)
        }
        out[model] = {
            "classes": classes,
            "class_names": cnames,
            "attrs": attrs,
            "attr_names": anames,
            "attr_types": types,
            "enums": enums,
            "enum_labels": enum_labels,
        }
        print(
            f"{model}: {len(classes)} classes, {len(attrs)} attrs,"
            f" {sum(len(v) for v in enums.values())} enum values"
            f" over {len(enums)} attrs"
        )
    path = OUT / "schema_models.json"
    path.write_text(json.dumps(out, separators=(",", ":")))
    print("schema_models.json:", path.stat().st_size, "bytes")




def emit_mgcp_combos() -> None:
    """MGCP illegal/warn area-overlap class-pair lists (mgcp_illegals.c:25,
    :516, :4244, :4734; consumed via Mgcp_*AreaCombos, interface2.c:327)."""
    text = (REF / "mgcp_illegals.c").read_text(errors="replace")
    data = {}
    for name in (
        "MGCP3_IllegalAreaCombos",
        "MGCP3_WarnAreaCombos",
        "MGCP4_IllegalAreaCombos",
        "MGCP4_WarnAreaCombos",
    ):
        flat = parse_string_array(text, name)
        assert len(flat) % 2 == 0, (name, len(flat))
        data[name] = list(zip(flat[::2], flat[1::2]))
        print(name, len(data[name]), "pairs")
    out = (
        '''"""MGCP illegal / warning area-overlap class-pair lists at REAL size.

Transcribed from the reference\'s MIT-licensed public data table
(mgcp_illegals.c:25 MGCP3_IllegalAreaCombos, :516 MGCP3_WarnAreaCombos,
:4244/:4734 the MGCP4 lists; consumed via the Mgcp_*AreaCombos pointers,
interface2.c:327-361, to gate the AOVERLAPA-family checks).  Pure data.
"""

'''
    )
    for name, pairs in data.items():
        out += f"{name.upper()} = {pairs!r}\n\n"
    (OUT / "mgcp_combos.py").write_text(out)




#: models shipping a second, WIDER "nunanpo" enum domain (No-Unknown /
#: Null / Populated-Only sentinel values; allow_nunanpo modes TT.c:23278)
NUNANPO_MODELS = {
    "D4": ("d4", "D4"),
    "DFDD": ("dfdd", "DFDD"),
    "FLDB": ("fldb", "FLDB"),
    "GGDM3": ("ggdm3", "GGDM3"),
    "NFDD": ("nfdd", "NFDD"),
    "UFD1": ("ufd1", "UFD1"),
    "UFD2": ("ufd2", "UFD2"),
    "UFD3": ("ufd3", "UFD3"),
}


def emit_nunanpo() -> None:
    """Per-attribute nunanpo enum slices ({stem}_nunanpo_enum.c:
    {P}_nunanpo_enum_codes + _attr_enum_count/_start, same slicing as the
    strict domain) -> schema_nunanpo.json."""
    import json

    out = {}
    for model, (stem, prefix) in NUNANPO_MODELS.items():
        text = (REF / f"{stem}_nunanpo_enum.c").read_text(errors="replace")
        atext = (REF / f"{stem}_attr.c").read_text(errors="replace")
        attrs = parse_string_array(atext, f"{prefix}_attr_codes")
        codes = parse_string_array(text, f"{prefix}_nunanpo_enum_codes")
        counts = parse_int_array(text, f"{prefix}_nunanpo_attr_enum_count")
        starts = parse_int_array(text, f"{prefix}_nunanpo_attr_enum_start")
        assert len(counts) == len(starts) == len(attrs), model
        out[model] = {
            a: codes[s : s + c]
            for a, c, s in zip(attrs, counts, starts)
            if c > 0 and 0 <= s and s + c <= len(codes)
        }
        print(
            f"{model}: {sum(len(v) for v in out[model].values())} nunanpo"
            f" enum values over {len(out[model])} attrs"
        )
    path = OUT / "schema_nunanpo.json"
    path.write_text(json.dumps(out, separators=(",", ":")))
    print("schema_nunanpo.json:", path.stat().st_size, "bytes")


if __name__ == "__main__":
    emit_isf()
    emit_tds6()
    emit_all_models()  # supersedes the older two-model emit_labels()
    emit_mgcp_combos()
    emit_nunanpo()
