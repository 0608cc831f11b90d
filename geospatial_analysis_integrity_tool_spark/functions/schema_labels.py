"""ECC/EAC human-readable label tables (condition-report LABEL1/LABEL2).

The class/attr NAME tables the ``GetECCLabel``/``GetEACLabel`` accessors
index (share_linux.h:1066-1085; gifd_functionality.c:83,:107).  Backed by
the full 16-model transcription in :mod:`.schema_models` (round 4 widened
this from MGCP3+TDS6 to every model), keyed by code (order-independent).
"""

from __future__ import annotations

from .schema_models import attr_labels, class_labels, model_names


class _LabelView(dict):
    """Lazy model -> {'class': {...}, 'attr': {...}} mapping (back-compat
    shape for conditions.with_labels and the oracle renderers)."""

    def __missing__(self, name: str):
        if name not in model_names():
            raise KeyError(name)
        v = {"class": class_labels(name), "attr": attr_labels(name)}
        self[name] = v
        return v

    def get(self, name, default=None):
        try:
            return self[name]
        except KeyError:
            return default


LABELS = _LabelView()


def ecc_label(model: str, fcode: str) -> str:
    """Class label for a feature code (GetECCLabel semantics: unknown code
    -> 'Error', the reference's out-of-range convention)."""
    return LABELS.get(model, {}).get("class", {}).get(fcode, "Error")


def eac_label(model: str, attr: str) -> str:
    """Attribute label for an attr code (GetEACLabel semantics)."""
    return LABELS.get(model, {}).get("attr", {}).get(attr, "Error")
