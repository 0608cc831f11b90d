"""Compiled-reference oracle: extract GAIT's pure C geometry predicates,
build a shared library, and expose them via ctypes for bit-for-bit fuzzing.

This is PARITY TEST INFRASTRUCTURE, not part of the engine.  At test time it

1. reads the reference sources under ``/root/reference/GAIT 26 Source``
   (override with ``$GAIT_REFERENCE_DIR``),
2. slices out a fixed list of *self-contained* functions by brace matching
   (PointInsidePoly TT.c:6920, AllCaseLineSegmentsIntersect
   moregeomchecks.c:5319, Distance TT.c:7151, TriangleXYsurfaceArea
   TT.c:6783, TruncateToNdigits utilities.c:97, PointOnQuarterDegreeBoundary
   TT.c:1400, and their helpers),
3. prepends a small shim (the globals the functions reference:
   ``PI``/``WGS84degreeLength`` from TTshare.h:14 / GAIT_API.h:31, a
   settable ``Ctype()``, ``Xtranslation``/``Ytranslation``), and
4. compiles ``gcc -O2 -ffp-contract=off -fPIC -shared`` into a content-hashed
   cache dir under the system temp dir.

Nothing from the reference is ever written inside the repo; the .so lives in
``$TMPDIR`` and tests skip cleanly when the reference or gcc is absent.

``-ffp-contract=off`` matters: the numpy parity twins in
``geospatial_analysis_integrity_tool_spark.functions.gait_parity`` perform the same IEEE-754
operations in the same order, and FMA contraction on the C side would break
the bit-for-bit comparison the fuzz tests assert.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import re
import shutil
import subprocess
import tempfile
from pathlib import Path

DEFAULT_REFERENCE_DIR = "/root/reference/GAIT 26 Source"

# (source file, function name) in dependency-safe order.
_FUNCTIONS = [
    ("utilities.c", "TruncateToNdigits"),
    ("SEEIT_API.c", "tempis2D"),
    ("TT.c", "IsSentinelZvalue"),
    ("TT.c", "LineEquation"),
    ("TT.c", "RadiansToDegrees"),
    ("TT.c", "AngleBetweenLineSegments"),
    ("TT.c", "EuclideanDistance"),
    ("TT.c", "Distance"),
    ("TT.c", "Distance3D"),
    ("TT.c", "TwoDecimalDistance"),
    ("TT.c", "EqualWithinTolerance"),
    ("TT.c", "NearlyEqual"),
    ("TT.c", "IsFlakeyNUNANPOvalue"),
    ("TT.c", "SensitivityCheck"),
    ("TT.c", "FindSpecificSensitivity"),
    ("TT.c", "FindRelevantSensitivity"),
    ("TT.c", "FindMaxSensitivities"),
    ("TT.c", "StrictlyBetween"),
    ("TT.c", "Between"),
    ("TT.c", "PointToLineDist"),
    ("TT.c", "ThreePointsAreColinear"),
    ("TT.c", "PointInAreal"),
    ("TT.c", "CalculateSliverRating"),
    ("TT.c", "SegmentsOffsetOverlap"),
    ("moregeomchecks.c", "FindAcuteAngleBetweenSegments"),
    ("TT.c", "PointToLineDist2D"),
    ("TT.c", "PointToFullLineDist2D"),
    ("TT.c", "PointOnLineSegment"),
    ("TT.c", "TriangleXYsurfaceArea"),
    ("TT.c", "PointInsidePoly"),
    ("TT.c", "PointInsideTriangle"),
    ("TT.c", "LineSegmentsIntersect"),
    ("TT.c", "PointOnQuarterDegreeBoundary"),
    ("TT.c", "CalculateGeodeticCoordArea"),
    ("moregeomchecks.c", "TwoPointsOnSameSideOfLine"),
    ("moregeomchecks.c", "AllCaseLineSegmentsIntersect"),
]

_SHIM = """
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int SzD = sizeof(double); /* interface.c's unified element size */

#define PIvalue 3.141592653589793
#define WGS84degreeLength 111319.5
#define MY2DSENTINEL 1.3070057
#define OneRadianInDegrees 57.29578
#define SENTINEL_SMIDGE .0000001

double PI = PIvalue;
double Xtranslation = 0.0;
double Ytranslation = 0.0;
int AlwaysUseEuclidean = 0;
int RefOracleCtype = 1;
int UseNUNANPO = 0;
int RefOracleAttrTDS = 0;
int RefOracleAttrGGDM = 0;

int Ctype(void) { return RefOracleCtype; }
int ATTRTYPE_ANY_TDS(void) { return RefOracleAttrTDS; }
int ATTRTYPE_ANY_GGDM(void) { return RefOracleAttrGGDM; }

/* minimal stand-ins for the globals CalculateGeodeticCoordArea touches
   (TT.c:475 ArealFromFile, TT.c:498 ArealForAreaCalculation, TT.c:563
   MinNativeX/Y); only the fields the function reads/writes are declared */
#define REF_MAX_VERTS 8192
static double AFF_x[REF_MAX_VERTS], AFF_y[REF_MAX_VERTS];
static double AFC_x[REF_MAX_VERTS], AFC_y[REF_MAX_VERTS];
struct ArealAsRead { double *x; double *y; int numverts; };
struct ArealAsRead ArealFromFile = { AFF_x, AFF_y, 0 };
struct CloneArealAsRead { double *x; double *y; int numverts; }
    ArealForAreaCalculation = { AFC_x, AFC_y, 0 };
double MinNativeX = 0.0;
double MinNativeY = 0.0;

void RefOracle_SetAreal(double *x, double *y, int n) {
    int i;
    for (i = 0; i < n && i < REF_MAX_VERTS; i++) {
        AFF_x[i] = x[i];
        AFF_y[i] = y[i];
    }
    ArealFromFile.numverts = n;
}

int CalculateGeodeticCoordArea(double minx, double miny, double *returnarea,
                               double *returnperimeter, int startindex,
                               int stopindex);

double RadiansToDegrees(double radianmeasure);
double AngleBetweenLineSegments(double lx1, double ly1, double lx2,
                                double ly2, double x1, double y1,
                                double x2, double y2);
int tempis2D(double val);
int IsSentinelZvalue(double v, int CountNUNANPOvaluesAs2D);
double Distance3D(double x1, double y1, double z1,
                  double x2, double y2, double z2);
double PointToFullLineDist2D(double px, double py, double lx1, double ly1,
                             double lx2, double ly2);
int PointInsideTriangle(double x, double y, double x1, double y1,
                        double x2, double y2, double x3, double y3);
int LineSegmentsIntersect(double xl, double yl, double xk, double yk,
                          double xm, double ym, double xn, double yn,
                          double *xi, double *yi);

double TruncateToNdigits(double x, int digits);
void LineEquation(double x1, double y1, double x2, double y2,
                  double *A, double *B, double *C);
double EuclideanDistance(double x1, double y1, double x2, double y2);
double Distance(double x1, double y1, double x2, double y2);
double TwoDecimalDistance(double x1, double y1, double x2, double y2);
int EqualWithinTolerance(double x1, double y1, double x2, double y2,
                         double tolerance);
int NearlyEqual(double v1, double v2);
int IsFlakeyNUNANPOvalue(char *in_strvalue, double dvalue, int AllowUnknown);

/* sensitivity-op macros (TTshare.h:18-26) + the minimal ActiveChecks slice
   SensitivityCheck reads (numthresholds / sensitivity / sensitivity2) */
#define LT 1
#define LTEQ 2
#define EQEQ 3
#define GTEQ 4
#define GT 5
#define OPENINT 6
#define GTCLOSED 7
#define CLOSEDINT 8
#define LTCLOSED 9
struct RefOracleCheck {
    int number; int numthresholds;
    double sensitivity; double sensitivity2; double sensitivity3;
    double sensitivity4; double sensitivity5; double sensitivity6;
};
struct RefOracleCheck ActiveChecks[16];
int TtlActiveChecks = 0;
void RefOracle_SetCheck(int idx, int numthresholds, double s1, double s2) {
    ActiveChecks[idx].numthresholds = numthresholds;
    ActiveChecks[idx].sensitivity = s1;
    ActiveChecks[idx].sensitivity2 = s2;
}
void RefOracle_SetCheckFull(int idx, int number, int numthresholds,
                            double s1, double s2, double s3, double s4,
                            double s5, double s6) {
    ActiveChecks[idx].number = number;
    ActiveChecks[idx].numthresholds = numthresholds;
    ActiveChecks[idx].sensitivity = s1;
    ActiveChecks[idx].sensitivity2 = s2;
    ActiveChecks[idx].sensitivity3 = s3;
    ActiveChecks[idx].sensitivity4 = s4;
    ActiveChecks[idx].sensitivity5 = s5;
    ActiveChecks[idx].sensitivity6 = s6;
}
int SensitivityCheck(int GT_LT_EQ, int checktype, int checknum, double checkvalue);
int FindSpecificSensitivity(int number, int checktype, int checknum, double *answer);
double FindRelevantSensitivity(int checktype, int checknum, double *sensitivity2);
double FindMaxSensitivities(int checktype, double *sensitivity2);
int StrictlyBetween(double x, double y, double x1, double y1, double x2, double y2);
int Between(double x, double y, double x1, double y1, double x2, double y2);
double PointToLineDist(double xp, double yp, double zp, double xl1, double yl1,
                       double zl1, double xl2, double yl2, double zl2);
int ThreePointsAreColinear(double *x, double *y, double *z);
int PointInAreal(double px, double py, double *x, double *y, int numverts, int *OnEdge);
int CalculateSliverRating(double *x, double *y, double *z, int vtxcnt,
                          double *width, double *height, double *ratio);
int SegmentsOffsetOverlap(double x1, double y1, double x2, double y2,
                          double x3, double y3, double x4, double y4);
double FindAcuteAngleBetweenSegments(double x1, double y1, double x2, double y2,
                                     double x3, double y3, double x4, double y4);
double PointToLineDist2D(double xj, double yj, double xk, double yk,
                         double xl, double yl);
int PointOnLineSegment(double px, double py, double x1, double y1,
                       double x2, double y2, double slack);
double TriangleXYsurfaceArea(double x[3], double y[3]);
int PointInsidePoly(double px, double py, double *x, double *y, int numb);
int PointOnQuarterDegreeBoundary(double px, double py, double tolerance);
int TwoPointsOnSameSideOfLine(double px1, double py1, double px2, double py2,
                              double lx1, double ly1, double lx2, double ly2);
int AllCaseLineSegmentsIntersect(double x1, double y1, double x2, double y2,
                                 double x3, double y3, double x4, double y4,
                                 double tolerance, double *xi, double *yi);
"""


def reference_dir() -> Path:
    return Path(os.environ.get("GAIT_REFERENCE_DIR", DEFAULT_REFERENCE_DIR))


def available() -> bool:
    return reference_dir().is_dir() and shutil.which("gcc") is not None


def _extract_function(source: str, name: str) -> str:
    """Slice one top-level C function body out of `source` by brace matching."""
    # Definition starts at column 0 with a type, name at start-of-line or after
    # the return type on the same/previous line; GAIT style puts the signature
    # on one line starting at column 0.
    pat = re.compile(
        r"^(?:int|double|void)\s+" + re.escape(name) + r"\s*\(", re.MULTILINE
    )
    m = None
    for cand in pat.finditer(source):
        # Skip prototypes: a definition's argument list is followed by `{`,
        # a declaration's by `;`.
        close = source.index(")", cand.end() - 1)
        depth = 1
        i = cand.end()
        while depth:
            c = source[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        close = i
        follow = source[close:close + 200].lstrip()
        if follow.startswith("{"):
            m = cand
            break
    if m is None:
        raise LookupError(f"function {name} not found")
    start = m.start()
    brace = source.index("{", close)
    depth = 0
    i = brace
    n = len(source)
    while i < n:
        c = source[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return source[start : i + 1]
        elif c == '"':
            i += 1
            while i < n and source[i] != '"':
                i += 2 if source[i] == "\\" else 1
        elif c == "'":
            i += 1
            while i < n and source[i] != "'":
                i += 2 if source[i] == "\\" else 1
        elif c == "/" and i + 1 < n and source[i + 1] == "*":
            i = source.index("*/", i) + 1
        elif c == "/" and i + 1 < n and source[i + 1] == "/":
            i = source.index("\n", i)
        i += 1
    raise ValueError(f"unbalanced braces extracting {name}")


def build_oracle_source() -> str:
    ref = reference_dir()
    texts: dict[str, str] = {}
    parts = [_SHIM]
    for fname, func in _FUNCTIONS:
        if fname not in texts:
            texts[fname] = (ref / fname).read_text(errors="replace")
        parts.append(f"/* === {fname}: {func} === */")
        parts.append(_extract_function(texts[fname], func))
    return "\n\n".join(parts) + "\n"


def build_shared_library() -> Path:
    """Compile the extracted functions; returns the cached .so path."""
    src = build_oracle_source()
    digest = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache = Path(tempfile.gettempdir()) / f"gait_ref_oracle_{digest}"
    so = cache / "libgaitref.so"
    if so.exists():
        return so
    cache.mkdir(parents=True, exist_ok=True)
    cfile = cache / "gaitref.c"
    cfile.write_text(src)
    subprocess.run(
        [
            "gcc",
            "-O2",
            "-ffp-contract=off",
            "-fno-builtin-sprintf",
            "-fPIC",
            "-shared",
            "-o",
            str(so),
            str(cfile),
            "-lm",
        ],
        check=True,
        capture_output=True,
    )
    return so


class RefOracle:
    """ctypes facade over the compiled reference predicates.

    Coordinates are in GAIT's native frame: for geodetic data
    ``gait = (degrees - translation) * 100000`` (TT.c:1980
    YCoordToProjectCoord).  Set ``xtranslation``/``ytranslation`` before
    calling; ``set_euclidean(True)`` flips Distance() to the planar branch.
    """

    def __init__(self) -> None:
        self._lib = ctypes.CDLL(str(build_shared_library()))
        L = self._lib
        D = ctypes.c_double
        I = ctypes.c_int
        PD = ctypes.POINTER(ctypes.c_double)
        L.TruncateToNdigits.restype = D
        L.TruncateToNdigits.argtypes = [D, I]
        L.Distance.restype = D
        L.Distance.argtypes = [D, D, D, D]
        L.TwoDecimalDistance.restype = D
        L.TwoDecimalDistance.argtypes = [D, D, D, D]
        L.EuclideanDistance.restype = D
        L.EuclideanDistance.argtypes = [D, D, D, D]
        L.EqualWithinTolerance.restype = I
        L.EqualWithinTolerance.argtypes = [D, D, D, D, D]
        L.PointToLineDist2D.restype = D
        L.PointToLineDist2D.argtypes = [D, D, D, D, D, D]
        L.PointOnLineSegment.restype = I
        L.PointOnLineSegment.argtypes = [D, D, D, D, D, D, D]
        L.TriangleXYsurfaceArea.restype = D
        L.TriangleXYsurfaceArea.argtypes = [PD, PD]
        L.PointInsidePoly.restype = I
        L.PointInsidePoly.argtypes = [D, D, PD, PD, I]
        L.PointOnQuarterDegreeBoundary.restype = I
        L.PointOnQuarterDegreeBoundary.argtypes = [D, D, D]
        L.TwoPointsOnSameSideOfLine.restype = I
        L.TwoPointsOnSameSideOfLine.argtypes = [D] * 8
        L.AllCaseLineSegmentsIntersect.restype = I
        L.AllCaseLineSegmentsIntersect.argtypes = [D] * 9 + [PD, PD]
        L.LineEquation.restype = None
        L.LineEquation.argtypes = [D, D, D, D, PD, PD, PD]
        L.RefOracle_SetAreal.restype = None
        L.RefOracle_SetAreal.argtypes = [PD, PD, I]
        L.CalculateGeodeticCoordArea.restype = I
        L.CalculateGeodeticCoordArea.argtypes = [D, D, PD, PD, I, I]
        L.tempis2D.restype = I
        L.tempis2D.argtypes = [D]
        L.RadiansToDegrees.restype = D
        L.RadiansToDegrees.argtypes = [D]
        L.AngleBetweenLineSegments.restype = D
        L.AngleBetweenLineSegments.argtypes = [D] * 8
        L.IsSentinelZvalue.restype = I
        L.IsSentinelZvalue.argtypes = [D, I]
        L.Distance3D.restype = D
        L.Distance3D.argtypes = [D, D, D, D, D, D]
        L.PointToFullLineDist2D.restype = D
        L.PointToFullLineDist2D.argtypes = [D, D, D, D, D, D]
        L.PointInsideTriangle.restype = I
        L.PointInsideTriangle.argtypes = [D] * 8
        L.LineSegmentsIntersect.restype = I
        L.LineSegmentsIntersect.argtypes = [D] * 8 + [PD, PD]
        L.IsFlakeyNUNANPOvalue.restype = I
        L.IsFlakeyNUNANPOvalue.argtypes = [ctypes.c_char_p, D, I]
        L.RefOracle_SetCheck.restype = None
        L.RefOracle_SetCheck.argtypes = [I, I, D, D]
        L.RefOracle_SetCheckFull.restype = None
        L.RefOracle_SetCheckFull.argtypes = [I, I, I] + [D] * 6
        L.SensitivityCheck.restype = I
        L.SensitivityCheck.argtypes = [I, I, I, D]
        L.FindSpecificSensitivity.restype = I
        L.FindSpecificSensitivity.argtypes = [I, I, I, PD]
        L.FindRelevantSensitivity.restype = D
        L.FindRelevantSensitivity.argtypes = [I, I, PD]
        L.FindMaxSensitivities.restype = D
        L.FindMaxSensitivities.argtypes = [I, PD]
        L.StrictlyBetween.restype = I
        L.StrictlyBetween.argtypes = [D] * 6
        L.Between.restype = I
        L.Between.argtypes = [D] * 6
        L.PointToLineDist.restype = D
        L.PointToLineDist.argtypes = [D] * 9
        L.ThreePointsAreColinear.restype = I
        L.ThreePointsAreColinear.argtypes = [PD, PD, PD]
        L.PointInAreal.restype = I
        L.PointInAreal.argtypes = [D, D, PD, PD, I, ctypes.POINTER(ctypes.c_int)]
        L.CalculateSliverRating.restype = I
        L.CalculateSliverRating.argtypes = [PD, PD, PD, I, PD, PD, PD]
        L.SegmentsOffsetOverlap.restype = I
        L.SegmentsOffsetOverlap.argtypes = [D] * 8
        L.FindAcuteAngleBetweenSegments.restype = D
        L.FindAcuteAngleBetweenSegments.argtypes = [D] * 8

    # -- globals ------------------------------------------------------------
    @property
    def xtranslation(self) -> float:
        return ctypes.c_double.in_dll(self._lib, "Xtranslation").value

    @xtranslation.setter
    def xtranslation(self, v: float) -> None:
        ctypes.c_double.in_dll(self._lib, "Xtranslation").value = v

    @property
    def ytranslation(self) -> float:
        return ctypes.c_double.in_dll(self._lib, "Ytranslation").value

    @ytranslation.setter
    def ytranslation(self, v: float) -> None:
        ctypes.c_double.in_dll(self._lib, "Ytranslation").value = v

    def set_euclidean(self, flag: bool) -> None:
        ctypes.c_int.in_dll(self._lib, "AlwaysUseEuclidean").value = int(flag)

    def set_ctype(self, v: int) -> None:
        ctypes.c_int.in_dll(self._lib, "RefOracleCtype").value = v

    # -- calls --------------------------------------------------------------
    def truncate_ndigits(self, x: float, digits: int) -> float:
        return self._lib.TruncateToNdigits(x, digits)

    def distance(self, x1, y1, x2, y2) -> float:
        return self._lib.Distance(x1, y1, x2, y2)

    def two_decimal_distance(self, x1, y1, x2, y2) -> float:
        return self._lib.TwoDecimalDistance(x1, y1, x2, y2)

    def equal_within_tolerance(self, x1, y1, x2, y2, tol) -> int:
        return self._lib.EqualWithinTolerance(x1, y1, x2, y2, tol)

    def point_to_line_dist2d(self, xj, yj, xk, yk, xl, yl) -> float:
        return self._lib.PointToLineDist2D(xj, yj, xk, yk, xl, yl)

    def point_on_line_segment(self, px, py, x1, y1, x2, y2, slack) -> int:
        return self._lib.PointOnLineSegment(px, py, x1, y1, x2, y2, slack)

    def triangle_xy_surface_area(self, xs, ys) -> float:
        ax = (ctypes.c_double * 3)(*[float(v) for v in xs])
        ay = (ctypes.c_double * 3)(*[float(v) for v in ys])
        return self._lib.TriangleXYsurfaceArea(ax, ay)

    def point_inside_poly(self, px, py, xs, ys) -> int:
        n = len(xs)
        ax = (ctypes.c_double * n)(*[float(v) for v in xs])
        ay = (ctypes.c_double * n)(*[float(v) for v in ys])
        return self._lib.PointInsidePoly(px, py, ax, ay, n)

    def point_on_quarter_degree_boundary(self, px, py, tol) -> int:
        return self._lib.PointOnQuarterDegreeBoundary(px, py, tol)

    def two_points_same_side(self, px1, py1, px2, py2, lx1, ly1, lx2, ly2) -> int:
        return self._lib.TwoPointsOnSameSideOfLine(
            px1, py1, px2, py2, lx1, ly1, lx2, ly2
        )

    def all_case_segments_intersect(
        self, x1, y1, x2, y2, x3, y3, x4, y4, tolerance
    ) -> tuple[int, float, float]:
        xi = ctypes.c_double(0.0)
        yi = ctypes.c_double(0.0)
        code = self._lib.AllCaseLineSegmentsIntersect(
            x1, y1, x2, y2, x3, y3, x4, y4, tolerance,
            ctypes.byref(xi), ctypes.byref(yi),
        )
        return code, xi.value, yi.value

    def set_nunanpo(self, flag: bool) -> None:
        ctypes.c_int.in_dll(self._lib, "UseNUNANPO").value = int(flag)

    def set_attr_tds(self, flag: bool) -> None:
        ctypes.c_int.in_dll(self._lib, "RefOracleAttrTDS").value = int(flag)

    @property
    def min_native_x(self) -> float:
        return ctypes.c_double.in_dll(self._lib, "MinNativeX").value

    @min_native_x.setter
    def min_native_x(self, v: float) -> None:
        ctypes.c_double.in_dll(self._lib, "MinNativeX").value = v

    @property
    def min_native_y(self) -> float:
        return ctypes.c_double.in_dll(self._lib, "MinNativeY").value

    @min_native_y.setter
    def min_native_y(self, v: float) -> None:
        ctypes.c_double.in_dll(self._lib, "MinNativeY").value = v

    def calculate_geodetic_coord_area(
        self, xs, ys, minx, miny, startindex, stopindex
    ) -> tuple[int, float, float]:
        """CalculateGeodeticCoordArea (TT.c:4200) over the shim's areal
        globals.  Coordinates in GAIT native units; set
        xtranslation/ytranslation/min_native_* first."""
        n = len(xs)
        ax = (ctypes.c_double * n)(*[float(v) for v in xs])
        ay = (ctypes.c_double * n)(*[float(v) for v in ys])
        self._lib.RefOracle_SetAreal(ax, ay, n)
        area = ctypes.c_double(0.0)
        perim = ctypes.c_double(0.0)
        rc = self._lib.CalculateGeodeticCoordArea(
            minx, miny, ctypes.byref(area), ctypes.byref(perim),
            startindex, stopindex,
        )
        return rc, area.value, perim.value

    def radians_to_degrees(self, v) -> float:
        return self._lib.RadiansToDegrees(v)

    def angle_between_line_segments(self, *args) -> float:
        return self._lib.AngleBetweenLineSegments(*args)

    def tempis2d(self, v) -> int:
        return self._lib.tempis2D(v)

    def is_sentinel_z(self, v, count_nunanpo) -> int:
        return self._lib.IsSentinelZvalue(v, count_nunanpo)

    def distance3d(self, x1, y1, z1, x2, y2, z2) -> float:
        return self._lib.Distance3D(x1, y1, z1, x2, y2, z2)

    def point_to_full_line_dist2d(self, px, py, lx1, ly1, lx2, ly2) -> float:
        return self._lib.PointToFullLineDist2D(px, py, lx1, ly1, lx2, ly2)

    def point_inside_triangle(self, x, y, x1, y1, x2, y2, x3, y3) -> int:
        return self._lib.PointInsideTriangle(x, y, x1, y1, x2, y2, x3, y3)

    def line_segments_intersect(
        self, xl, yl, xk, yk, xm, ym, xn, yn
    ) -> tuple[int, float, float]:
        xi = ctypes.c_double(0.0)
        yi = ctypes.c_double(0.0)
        code = self._lib.LineSegmentsIntersect(
            xl, yl, xk, yk, xm, ym, xn, yn, ctypes.byref(xi), ctypes.byref(yi)
        )
        return code, xi.value, yi.value

    def is_flakey_nunanpo(self, strval, dvalue, allow_unknown) -> int:
        """IsFlakeyNUNANPOvalue (TT.c:1625).  strval=None takes the numeric
        (NearlyEqual) path; allow_unknown is the howtocheck value (2 = allow
        all nunanpo incl. Unknown family, 3 = all less 'Unknown')."""
        b = strval.encode() if strval is not None else None
        return self._lib.IsFlakeyNUNANPOvalue(b, float(dvalue), int(allow_unknown))

    def set_check(self, idx, numthresholds, s1, s2) -> None:
        """Populate the shim ActiveChecks slice for SensitivityCheck."""
        self._lib.RefOracle_SetCheck(idx, numthresholds, float(s1), float(s2))

    def sensitivity_check(self, op, checktype, checknum, value) -> int:
        """SensitivityCheck (TT.c:13798): the 9-op threshold dispatch."""
        return self._lib.SensitivityCheck(op, checktype, checknum, float(value))

    def set_check_full(self, idx, number, numthresholds, s=(0, 0, 0, 0, 0, 0)):
        self._lib.RefOracle_SetCheckFull(
            idx, number, numthresholds, *[float(v) for v in s]
        )

    def set_ttl_active_checks(self, n) -> None:
        ctypes.c_int.in_dll(self._lib, "TtlActiveChecks").value = int(n)

    def find_specific_sensitivity(self, number, checktype, checknum):
        out = ctypes.c_double(0.0)
        found = self._lib.FindSpecificSensitivity(
            number, checktype, checknum, ctypes.byref(out)
        )
        return found, out.value

    def find_relevant_sensitivity(self, checktype, checknum):
        s2 = ctypes.c_double(0.0)
        s1 = self._lib.FindRelevantSensitivity(checktype, checknum, ctypes.byref(s2))
        return s1, s2.value

    def find_max_sensitivities(self, checktype):
        s2 = ctypes.c_double(0.0)
        s1 = self._lib.FindMaxSensitivities(checktype, ctypes.byref(s2))
        return s1, s2.value

    def strictly_between(self, x, y, x1, y1, x2, y2) -> int:
        return self._lib.StrictlyBetween(x, y, x1, y1, x2, y2)

    def between(self, x, y, x1, y1, x2, y2) -> int:
        return self._lib.Between(x, y, x1, y1, x2, y2)

    def point_to_line_dist_3d(self, *args) -> float:
        """PointToLineDist (TT.c:7358): clamped 3D point-to-segment."""
        return self._lib.PointToLineDist(*[float(a) for a in args])

    def three_points_colinear(self, xs, ys, zs) -> int:
        ax = (ctypes.c_double * 3)(*[float(v) for v in xs])
        ay = (ctypes.c_double * 3)(*[float(v) for v in ys])
        az = (ctypes.c_double * 3)(*[float(v) for v in zs])
        return self._lib.ThreePointsAreColinear(ax, ay, az)

    def point_in_areal(self, px, py, xs, ys) -> tuple[int, int]:
        n = len(xs)
        ax = (ctypes.c_double * n)(*[float(v) for v in xs])
        ay = (ctypes.c_double * n)(*[float(v) for v in ys])
        on_edge = ctypes.c_int(0)
        inside = self._lib.PointInAreal(px, py, ax, ay, n, ctypes.byref(on_edge))
        return inside, on_edge.value

    def segments_offset_overlap(self, *args) -> int:
        """SegmentsOffsetOverlap (TT.c:8893): strict bbox-interval overlap."""
        return self._lib.SegmentsOffsetOverlap(*[float(a) for a in args])

    def find_acute_angle(self, *args) -> float:
        """FindAcuteAngleBetweenSegments (moregeomchecks.c:1591)."""
        return self._lib.FindAcuteAngleBetweenSegments(*[float(a) for a in args])

    def sliver_rating(self, xs, ys, zs) -> tuple[int, float, float, float]:
        """CalculateSliverRating (TT.c:10438).  The C mutates its arrays
        (consecutive-duplicate squeeze); the wrapper passes copies."""
        n = len(xs)
        ax = (ctypes.c_double * n)(*[float(v) for v in xs])
        ay = (ctypes.c_double * n)(*[float(v) for v in ys])
        az = (ctypes.c_double * n)(*[float(v) for v in zs])
        w = ctypes.c_double(0.0)
        h = ctypes.c_double(0.0)
        r = ctypes.c_double(0.0)
        rc = self._lib.CalculateSliverRating(
            ax, ay, az, n, ctypes.byref(w), ctypes.byref(h), ctypes.byref(r)
        )
        return rc, w.value, h.value, r.value

    def line_equation(self, x1, y1, x2, y2) -> tuple[float, float, float]:
        A = ctypes.c_double(0.0)
        B = ctypes.c_double(0.0)
        C = ctypes.c_double(0.0)
        self._lib.LineEquation(
            x1, y1, x2, y2, ctypes.byref(A), ctypes.byref(B), ctypes.byref(C)
        )
        return A.value, B.value, C.value


_ORACLE: RefOracle | None = None


def get_oracle() -> RefOracle:
    global _ORACLE
    if _ORACLE is None:
        _ORACLE = RefOracle()
    return _ORACLE


if __name__ == "__main__":
    o = get_oracle()
    print("so built; PointInsidePoly unit square:", o.point_inside_poly(
        0.5, 0.5, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]))
