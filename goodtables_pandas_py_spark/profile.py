"""Descriptor profile validation (SURVEY.md §1.4, §2.1 S1).

The reference validates the descriptor *itself* against the Data
Package / Table Schema profiles before touching any data
([R validate.py::validate]; public specs: Data Package v1, Table
Schema v1 at specs.frictionlessdata.io). We vendor a compact profile
— a JSON-Schema-style document covering the descriptor surface this
engine supports — and evaluate it with a small self-contained checker
(keywords: type, required, properties, items, enum, minItems, anyOf),
so profile validation never depends on an optional package.

Violations become structured :class:`~.errors.Error` rows
(``datapackage-error`` for package-level problems, ``schema-error``
inside a ``schema`` subtree), which ``validate_package`` returns as a
report instead of raising — descriptor errors skip table checks
(SURVEY.md §4 short-circuiting).
"""

from __future__ import annotations

from typing import Any

from .errors import Error
from .schema import FIELD_TYPES

#: string-or-list-of-strings (primaryKey, FK fields) [SPEC table-schema]
_STR_OR_STRLIST = {
    "anyOf": [
        {"type": "string"},
        {"type": "array", "items": {"type": "string"}, "minItems": 1},
    ]
}

#: Table Schema v1 profile subset [SPEC table-schema]
TABLE_SCHEMA_PROFILE: dict[str, Any] = {
    "type": "object",
    "required": ["fields"],
    "properties": {
        "fields": {
            "type": "array",
            "minItems": 1,
            "items": {
                "type": "object",
                "required": ["name"],
                "properties": {
                    "name": {"type": "string"},
                    "type": {"enum": sorted(FIELD_TYPES)},
                    "format": {"type": "string"},
                    "constraints": {"type": "object"},
                    "decimalChar": {"type": "string"},
                    "groupChar": {"type": "string"},
                    "bareNumber": {"type": "boolean"},
                    "trueValues": {"type": "array", "items": {"type": "string"}},
                    "falseValues": {"type": "array", "items": {"type": "string"}},
                },
            },
        },
        "missingValues": {"type": "array", "items": {"type": "string"}},
        "primaryKey": _STR_OR_STRLIST,
        "uniqueKeys": {"type": "array", "items": _STR_OR_STRLIST},
        "foreignKeys": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["fields", "reference"],
                "properties": {
                    "fields": _STR_OR_STRLIST,
                    "reference": {
                        "type": "object",
                        "required": ["fields"],
                        "properties": {
                            "resource": {"type": "string"},
                            "fields": _STR_OR_STRLIST,
                        },
                    },
                },
            },
        },
    },
}

#: Data Package v1 profile subset [SPEC data-package]; extra metadata
#: keys are allowed everywhere (the specs are open).
PACKAGE_PROFILE: dict[str, Any] = {
    "type": "object",
    "required": ["resources"],
    "properties": {
        "name": {"type": "string"},
        "resources": {
            "type": "array",
            "minItems": 1,
            "items": {
                "type": "object",
                "properties": {
                    "name": {"type": "string"},
                    "path": {"type": "string"},
                    "format": {"type": "string"},
                    "encoding": {"type": "string"},
                    # engine extension: XML row element (sources.read_xml_stringly)
                    "rowTag": {"type": "string"},
                    # engine extension: dataset-level statistics checks
                    # (validate.compile_dataset_checks)
                    "datasetChecks": {
                        "type": "array",
                        "items": {
                            "type": "object",
                            "required": ["metric", "field"],
                            "properties": {
                                "name": {"type": "string"},
                                "metric": {"type": "string"},
                                "field": {"type": "string"},
                                "min": {"type": "number"},
                                "max": {"type": "number"},
                                "allowNull": {"type": "boolean"},
                                "message": {"type": "string"},
                            },
                        },
                    },
                    "dialect": {
                        "type": "object",
                        "properties": {
                            "delimiter": {"type": "string"},
                            "quoteChar": {"type": "string"},
                            "doubleQuote": {"type": "boolean"},
                            "escapeChar": {"type": "string"},
                            "lineTerminator": {"type": "string"},
                            "header": {"type": "boolean"},
                            "skipInitialSpace": {"type": "boolean"},
                            "multiline": {"type": "boolean"},
                        },
                    },
                    "schema": TABLE_SCHEMA_PROFILE,
                },
            },
        },
    },
}

_TYPES = {
    "object": dict,
    "array": list,
    "string": str,
    "integer": int,
    "number": (int, float),
    "boolean": bool,
}


def _type_ok(value: Any, expected: str) -> bool:
    if expected in ("integer", "number") and isinstance(value, bool):
        return False  # bool is an int in Python, not in JSON Schema
    return isinstance(value, _TYPES[expected])


def _walk(schema: dict, value: Any, path: str, out: list[str]) -> None:
    """Evaluate the profile subset; append 'path: problem' strings."""
    if "anyOf" in schema:
        for alt in schema["anyOf"]:
            probe: list[str] = []
            _walk(alt, value, path, probe)
            if not probe:
                return
        out.append(f"{path or '<root>'}: matches no allowed shape")
        return
    if "enum" in schema:
        if value not in schema["enum"]:
            out.append(f"{path or '<root>'}: {value!r} not one of {schema['enum']}")
        return
    t = schema.get("type")
    if t and not _type_ok(value, t):
        out.append(f"{path or '<root>'}: expected {t}, got {type(value).__name__}")
        return
    if t == "object":
        for req in schema.get("required", []):
            if req not in value:
                out.append(f"{path or '<root>'}: missing required {req!r}")
        for key, sub in schema.get("properties", {}).items():
            if key in value:
                _walk(sub, value[key], f"{path}/{key}" if path else key, out)
    elif t == "array":
        if len(value) < schema.get("minItems", 0):
            out.append(f"{path or '<root>'}: fewer than {schema['minItems']} items")
        items = schema.get("items")
        if items:
            for i, item in enumerate(value):
                _walk(items, item, f"{path}/{i}", out)


def check_descriptor(descriptor: Any) -> list[Error]:
    """Validate a package descriptor against the vendored profile.

    Returns one :class:`Error` per violation — ``schema-error`` when
    the violation is inside a resource's ``schema`` subtree,
    ``datapackage-error`` otherwise. Empty list = profile-clean
    (dataclass invariants may still reject cross-field problems the
    profile can't express, e.g. a primaryKey naming an unknown field).
    """
    problems: list[str] = []
    _walk(PACKAGE_PROFILE, descriptor, "", problems)
    errors = []
    for p in problems:
        # the path is everything before ': '; a violation AT the
        # schema node ('resources/0/schema: missing ...') is a Table
        # Schema problem too — substring '/schema/' alone missed it
        path = p.split(":", 1)[0]
        segs = path.split("/")
        code = "schema-error" if "schema" in segs else "datapackage-error"
        errors.append(Error(code=code, message=p, count=1))
    return errors


def descriptor_error_report(errors: list[Error]) -> dict:
    """Report shape for descriptor-level failures: no tables were
    checked, the package-level ``errors`` list carries the problems
    (mirrors the reference returning a report, not raising)."""
    return {
        "valid": False,
        "error-count": len(errors),
        "table-count": 0,
        "tables": [],
        "errors": [e.to_dict() for e in errors],
    }
