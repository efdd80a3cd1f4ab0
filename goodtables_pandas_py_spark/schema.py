"""Table Schema / Data Package model (SURVEY.md §1, D1-D4).

Declared-schema data model mirroring the public reference
``goodtables_pandas`` package's descriptor handling
([R validate.py::validate], Frictionless Table Schema v1 /
Data Package v1 specs). Pure driver-side Python — no Spark imports —
so it is testable without a cluster (SURVEY.md §7.1 M1).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field as dc_field
from typing import Any

#: Table Schema v1 logical types we support (SURVEY.md §1.3).
FIELD_TYPES = {
    "string",
    "number",
    "integer",
    "boolean",
    "date",
    "time",
    "datetime",
    "year",
    "yearmonth",
    "duration",
    "object",
    "array",
    "geopoint",
    "geojson",
    "any",
}

#: string formats that are validations (SURVEY.md §2.3 P2-P5)
STRING_FORMATS = {"default", "email", "uri", "uuid", "binary"}

#: Table Schema defaults [SPEC table-schema §boolean]
DEFAULT_TRUE_VALUES = ["true", "True", "TRUE", "1"]
DEFAULT_FALSE_VALUES = ["false", "False", "FALSE", "0"]
#: [SPEC table-schema §missing-values]
DEFAULT_MISSING_VALUES = [""]

CONSTRAINT_KEYS = {
    "required",
    "unique",
    "minLength",
    "maxLength",
    "minimum",
    "maximum",
    "enum",
    "pattern",
}


class SchemaError(ValueError):
    """Raised for structurally invalid descriptors (goodtables
    ``schema-error`` class of problems)."""


@dataclass
class Field:
    """One field descriptor [SPEC table-schema §field-descriptors]."""

    name: str
    type: str = "string"
    format: str = "default"
    constraints: dict[str, Any] = dc_field(default_factory=dict)
    # number / integer lexical options
    decimal_char: str = "."
    group_char: str = ""
    bare_number: bool = True
    # boolean vocabularies
    true_values: list[str] = dc_field(default_factory=lambda: list(DEFAULT_TRUE_VALUES))
    false_values: list[str] = dc_field(
        default_factory=lambda: list(DEFAULT_FALSE_VALUES)
    )

    def __post_init__(self) -> None:
        if self.type not in FIELD_TYPES:
            raise SchemaError(f"field {self.name!r}: unknown type {self.type!r}")
        if self.type == "string" and self.format not in STRING_FORMATS:
            raise SchemaError(
                f"field {self.name!r}: unknown string format {self.format!r}"
            )
        for k in self.constraints:
            if k not in CONSTRAINT_KEYS:
                raise SchemaError(f"field {self.name!r}: unknown constraint {k!r}")
        # minimum/maximum need a totally-ordered physical type
        # [SPEC table-schema §constraints: applies to numeric, date,
        # time, datetime, year, yearmonth, duration]; a JSON/string/
        # geopoint type would otherwise die at plan time with an
        # opaque DATATYPE_MISMATCH deep inside the checks. duration
        # (r11): the parsed struct<months,seconds> orders field-wise
        # lexicographically and the constraint literal parses to the
        # matching struct — note calendar months vs clock seconds are
        # compared POSITIONALLY (P1M > P30D), the same convention as
        # the parse itself
        ORDERED = {"integer", "number", "year", "yearmonth",
                   "date", "time", "datetime", "duration"}
        for k in ("minimum", "maximum"):
            if k in self.constraints and self.type not in ORDERED:
                raise SchemaError(
                    f"field {self.name!r}: constraint {k!r} is not "
                    f"supported for type {self.type!r} (applies to "
                    "numeric/temporal types; use minLength/maxLength "
                    "for strings and collections)"
                )

    @classmethod
    def from_descriptor(cls, d: dict[str, Any]) -> "Field":
        if "name" not in d:
            raise SchemaError("field descriptor missing 'name'")
        return cls(
            name=d["name"],
            type=d.get("type", "string"),
            format=d.get("format", "default"),
            constraints=dict(d.get("constraints", {})),
            decimal_char=d.get("decimalChar", "."),
            group_char=d.get("groupChar", ""),
            bare_number=d.get("bareNumber", True),
            true_values=list(d.get("trueValues", DEFAULT_TRUE_VALUES)),
            false_values=list(d.get("falseValues", DEFAULT_FALSE_VALUES)),
        )

    def to_descriptor(self) -> dict[str, Any]:
        """Table Schema field dict — the inverse of
        :func:`from_descriptor` (round-trips exactly). Defaults are
        omitted so the JSON stays minimal and spec-idiomatic."""
        d: dict[str, Any] = {"name": self.name}
        if self.type != "string" or self.format != "default":
            d["type"] = self.type
        if self.format != "default":
            d["format"] = self.format
        if self.constraints:
            d["constraints"] = dict(self.constraints)
        if self.decimal_char != ".":
            d["decimalChar"] = self.decimal_char
        if self.group_char:
            d["groupChar"] = self.group_char
        if not self.bare_number:
            d["bareNumber"] = False
        if self.true_values != list(DEFAULT_TRUE_VALUES):
            d["trueValues"] = list(self.true_values)
        if self.false_values != list(DEFAULT_FALSE_VALUES):
            d["falseValues"] = list(self.false_values)
        return d


@dataclass
class ForeignKey:
    """[SPEC table-schema §foreign-keys]; ``reference.resource == ""``
    means self-reference ([R check.py::check_foreign_keys])."""

    fields: list[str]
    reference_resource: str
    reference_fields: list[str]

    @classmethod
    def from_descriptor(cls, d: dict[str, Any]) -> "ForeignKey":
        flds = d.get("fields")
        ref = d.get("reference", {})
        if not flds or not ref.get("fields"):
            raise SchemaError(f"invalid foreignKey descriptor: {d!r}")
        flds = [flds] if isinstance(flds, str) else list(flds)
        rfields = ref["fields"]
        rfields = [rfields] if isinstance(rfields, str) else list(rfields)
        if len(flds) != len(rfields):
            raise SchemaError(f"foreignKey field arity mismatch: {d!r}")
        return cls(
            fields=flds,
            reference_resource=ref.get("resource", ""),
            reference_fields=rfields,
        )

    def to_descriptor(self) -> dict[str, Any]:
        """Inverse of :func:`from_descriptor` (round-trips exactly)."""
        return {
            "fields": list(self.fields),
            "reference": {
                "resource": self.reference_resource,
                "fields": list(self.reference_fields),
            },
        }


@dataclass
class TableSchema:
    """[SPEC table-schema]; ``uniqueKeys`` is the reference's extension
    ([R check.py::check_unique_keys])."""

    fields: list[Field]
    missing_values: list[str] = dc_field(
        default_factory=lambda: list(DEFAULT_MISSING_VALUES)
    )
    primary_key: list[str] = dc_field(default_factory=list)
    unique_keys: list[list[str]] = dc_field(default_factory=list)
    foreign_keys: list[ForeignKey] = dc_field(default_factory=list)

    def __post_init__(self) -> None:
        names = [f.name for f in self.fields]
        if len(set(names)) != len(names):
            raise SchemaError(f"duplicate field names: {names}")
        known = set(names)
        for col in self.primary_key:
            if col not in known:
                raise SchemaError(f"primaryKey field {col!r} not in schema")
        for key in self.unique_keys:
            for col in key:
                if col not in known:
                    raise SchemaError(f"uniqueKeys field {col!r} not in schema")
        for fk in self.foreign_keys:
            for col in fk.fields:
                if col not in known:
                    raise SchemaError(f"foreignKey field {col!r} not in schema")

    def field(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    @classmethod
    def from_descriptor(cls, d: dict[str, Any]) -> "TableSchema":
        if "fields" not in d or not isinstance(d["fields"], list):
            raise SchemaError("schema descriptor missing 'fields' list")
        pk = d.get("primaryKey", [])
        pk = [pk] if isinstance(pk, str) else list(pk)
        uks = [[k] if isinstance(k, str) else list(k) for k in d.get("uniqueKeys", [])]
        return cls(
            fields=[Field.from_descriptor(fd) for fd in d["fields"]],
            missing_values=list(d.get("missingValues", DEFAULT_MISSING_VALUES)),
            primary_key=pk,
            unique_keys=uks,
            foreign_keys=[
                ForeignKey.from_descriptor(fk) for fk in d.get("foreignKeys", [])
            ],
        )

    def to_descriptor(self) -> dict[str, Any]:
        """Table Schema dict — the inverse of :func:`from_descriptor`
        (round-trips exactly; json.dump it into a datapackage.json).
        Completes the infer-then-save loop: ``infer_schema(df)``
        proposes a TableSchema, this serializes it. Defaults
        (missingValues [""], empty keys) are omitted."""
        d: dict[str, Any] = {
            "fields": [f.to_descriptor() for f in self.fields]
        }
        if self.missing_values != list(DEFAULT_MISSING_VALUES):
            d["missingValues"] = list(self.missing_values)
        if self.primary_key:
            d["primaryKey"] = list(self.primary_key)
        if self.unique_keys:
            d["uniqueKeys"] = [list(k) for k in self.unique_keys]
        if self.foreign_keys:
            d["foreignKeys"] = [fk.to_descriptor() for fk in self.foreign_keys]
        return d


@dataclass
class Dialect:
    """CSV dialect [SPEC csv-dialect], subset used by the reference's
    pandas.read_csv call ([R validate.py::validate])."""

    delimiter: str = ","
    quote_char: str = '"'
    double_quote: bool = True
    escape_char: str | None = None
    line_terminator: str = "\r\n"
    header: bool = True
    skip_initial_space: bool = False
    #: extension (not in [SPEC csv-dialect]): fields may contain quoted
    #: newlines. Default OFF deliberately — multiLine CSV parsing makes
    #: files NON-SPLITTABLE (one task per file regardless of size),
    #: which serializes a 100 TB scan; opt in only when the data
    #: genuinely embeds newlines.
    multiline: bool = False

    @classmethod
    def from_descriptor(cls, d: dict[str, Any]) -> "Dialect":
        return cls(
            delimiter=d.get("delimiter", ","),
            quote_char=d.get("quoteChar", '"'),
            double_quote=d.get("doubleQuote", True),
            escape_char=d.get("escapeChar"),
            line_terminator=d.get("lineTerminator", "\r\n"),
            header=d.get("header", True),
            skip_initial_space=d.get("skipInitialSpace", False),
            multiline=bool(d.get("multiline", False)),
        )

    def to_descriptor(self) -> dict[str, Any]:
        """Inverse of :func:`from_descriptor`; defaults omitted."""
        d: dict[str, Any] = {}
        if self.delimiter != ",":
            d["delimiter"] = self.delimiter
        if self.quote_char != '"':
            d["quoteChar"] = self.quote_char
        if not self.double_quote:
            d["doubleQuote"] = False
        if self.escape_char is not None:
            d["escapeChar"] = self.escape_char
        if self.line_terminator != "\r\n":
            d["lineTerminator"] = self.line_terminator
        if not self.header:
            d["header"] = False
        if self.skip_initial_space:
            d["skipInitialSpace"] = True
        if self.multiline:
            d["multiline"] = True
        return d


@dataclass
class Resource:
    """One resource (D2): path + schema + dialect."""

    name: str
    path: str | None = None
    schema: TableSchema | None = None
    dialect: Dialect = dc_field(default_factory=Dialect)
    encoding: str = "utf-8"
    format: str | None = None  # csv | parquet | orc | avro | json | ndjson/jsonl | xml | inline
    #: inline data [SPEC data-package §resource.data]: array of objects
    #: or array of arrays (first row = header when dialect.header)
    data: Any = None
    #: XML only (descriptor key ``rowTag``, an engine extension — the
    #: Data Package spec does not define XML options): the element
    #: that delimits one table row. Default "row".
    row_tag: str | None = None
    #: dataset-level statistics checks (descriptor key
    #: ``datasetChecks``, an engine extension): raw spec dicts,
    #: compiled by validate.compile_dataset_checks at validation time
    #: (structurally checked at parse time so malformed specs fail as
    #: SchemaError like any other descriptor problem).
    dataset_checks: list = dc_field(default_factory=list)

    @classmethod
    def from_descriptor(cls, d: dict[str, Any], base_dir: str = ".") -> "Resource":
        name = d.get("name") or os.path.splitext(os.path.basename(d.get("path", "")))[0]
        if not name:
            raise SchemaError("resource needs a name or path")
        path = d.get("path")
        data = d.get("data")
        # no path AND no data is legal at parse time: callers may
        # supply the DataFrame directly (validate(dataframes=...));
        # read_resource raises if actually asked to read such a resource
        if path is not None and not _is_url(path):
            path = os.path.join(base_dir, path)
        schema = d.get("schema")
        fmt = d.get("format")
        if fmt is None and data is not None:
            fmt = "inline"
        if fmt is None and path:
            stem, ext = os.path.splitext(path)
            ext = ext.lstrip(".").lower()
            # compressed text resources: data.csv.gz / events.ndjson.bz2
            # — Spark's text readers decompress these transparently, so
            # the FORMAT is the inner extension (the codec is a storage
            # detail, not a dialect)
            if ext in ("gz", "gzip", "bz2", "zst", "zstd", "deflate"):
                ext = os.path.splitext(stem)[1].lstrip(".").lower()
            fmt = ext or None
        ds_specs = d.get("datasetChecks", [])
        if ds_specs:
            if not isinstance(ds_specs, list) or not all(
                isinstance(x, dict) for x in ds_specs
            ):
                raise SchemaError(
                    "datasetChecks must be a list of objects"
                )
            # structural check now (SchemaError like any descriptor
            # problem); actual compilation happens at validation time
            from .validate import compile_dataset_checks

            compile_dataset_checks(ds_specs)
        return cls(
            name=name,
            path=path,
            schema=TableSchema.from_descriptor(schema) if schema else None,
            dialect=Dialect.from_descriptor(d.get("dialect", {})),
            encoding=d.get("encoding", "utf-8"),
            format=fmt,
            data=data,
            row_tag=d.get("rowTag"),
            dataset_checks=list(ds_specs),
        )

    def to_descriptor(self) -> dict[str, Any]:
        """Resource dict — re-parses to an equivalent Resource (paths
        are emitted as held, so round-trip with base_dir=".").
        ``format`` is kept explicit (from_descriptor would re-sniff
        from the extension, but explicit beats implicit in a saved
        artifact); the inline sentinel format is dropped since
        ``data``'s presence already implies it."""
        d: dict[str, Any] = {"name": self.name}
        if self.path is not None:
            d["path"] = self.path
        if self.data is not None:
            d["data"] = self.data
        if self.schema is not None:
            d["schema"] = self.schema.to_descriptor()
        dialect = self.dialect.to_descriptor()
        if dialect:
            d["dialect"] = dialect
        if self.encoding != "utf-8":
            d["encoding"] = self.encoding
        if self.format is not None and self.format != "inline":
            d["format"] = self.format
        if self.row_tag is not None:
            d["rowTag"] = self.row_tag
        if self.dataset_checks:
            d["datasetChecks"] = [dict(x) for x in self.dataset_checks]
        return d


@dataclass
class Package:
    """Data Package (D1): named resources."""

    resources: list[Resource]
    name: str = ""

    def resource(self, name: str) -> Resource:
        for r in self.resources:
            if r.name == name:
                return r
        raise KeyError(name)

    @classmethod
    def from_descriptor(cls, d: dict[str, Any], base_dir: str = ".") -> "Package":
        if "resources" not in d or not isinstance(d["resources"], list):
            raise SchemaError("package descriptor missing 'resources' list")
        resources = [Resource.from_descriptor(rd, base_dir) for rd in d["resources"]]
        names = [r.name for r in resources]
        if len(set(names)) != len(names):
            raise SchemaError(f"duplicate resource names: {names}")
        return cls(resources=resources, name=d.get("name", ""))

    def to_descriptor(self) -> dict[str, Any]:
        """Data Package dict — json.dump it as ``datapackage.json``.
        Together with the schema/dialect serializers this closes the
        authoring loop: build or infer Resources programmatically,
        save the package, re-validate from the saved file."""
        d: dict[str, Any] = {
            "resources": [r.to_descriptor() for r in self.resources]
        }
        if self.name:
            d["name"] = self.name
        return d


def _is_url(path: str) -> bool:
    return "://" in path


def load_descriptor(source: str | dict[str, Any]) -> tuple[dict[str, Any], str]:
    """Resolve a descriptor source (path or dict) to ``(descriptor,
    base_dir)`` without interpreting it — profile validation runs on
    the raw dict before dataclass construction (SURVEY.md §1.4)."""
    if isinstance(source, dict):
        return source, "."
    with open(source, encoding="utf-8") as fh:
        return json.load(fh), os.path.dirname(source) or "."


def load_package(source: str | dict[str, Any]) -> Package:
    """S1: load a datapackage.json from a path or dict
    ([R validate.py::validate], SURVEY.md §2.1 S1). Raises
    :class:`SchemaError` on invalid descriptors — the programmatic
    API; ``validate_package`` instead *reports* descriptor problems
    (profile check + this fallback) as structured errors."""
    descriptor, base_dir = load_descriptor(source)
    return Package.from_descriptor(descriptor, base_dir=base_dir)


def schema_diff(old: "TableSchema", new: "TableSchema") -> list[dict]:
    """Schema-evolution report: every difference between two
    TableSchema versions as ``{kind, field, detail, breaking}`` dicts
    (driver-side — schemas are tiny). ``breaking`` means existing
    data valid under ``old`` may FAIL validation under ``new``
    (reader-compatibility view):

    - field removed / type / format changed → breaking
    - field added → breaking only if its constraints include
      ``required`` (old rows lack the column entirely)
    - constraint added or TIGHTENED (required added, enum narrowed,
      minimum raised, maximum lowered, minLength raised, maxLength
      lowered, pattern changed) → breaking; loosened → compatible
    - primaryKey / uniqueKeys / foreignKeys changed → breaking
      (new uniqueness/reference demands on existing data)

    Use in CI: fail a descriptor change when any ``breaking`` entry
    exists unless the change is explicitly acknowledged.
    """
    out: list[dict] = []
    ofields = {f.name: f for f in old.fields}
    nfields = {f.name: f for f in new.fields}

    for name in ofields.keys() - nfields.keys():
        out.append({"kind": "field-removed", "field": name,
                    "detail": None, "breaking": True})
    for name in nfields.keys() - ofields.keys():
        req = bool(nfields[name].constraints.get("required"))
        out.append({"kind": "field-added", "field": name,
                    "detail": "required" if req else None,
                    "breaking": req})

    # constraint tightening rules: (key, tighter-predicate)
    def tightened(key, ov, nv) -> bool | None:
        """True = tightened (breaking), False = loosened/equal,
        None = not comparable (treat any change as breaking)."""
        if key in ("minimum", "minLength"):
            try:
                return nv > ov
            except TypeError:
                return None
        if key in ("maximum", "maxLength"):
            try:
                return nv < ov
            except TypeError:
                return None
        if key == "enum":
            try:
                return not set(map(str, ov)) <= set(map(str, nv))
            except TypeError:
                return None
        if key == "required":
            return bool(nv) and not bool(ov)
        if key == "unique":
            return bool(nv) and not bool(ov)
        return None  # pattern and anything else: change = breaking

    for name in ofields.keys() & nfields.keys():
        of, nf = ofields[name], nfields[name]
        if of.type != nf.type:
            out.append({"kind": "type-changed", "field": name,
                        "detail": f"{of.type} -> {nf.type}",
                        "breaking": True})
        if of.format != nf.format:
            # report independently of a type change — the docstring
            # promises EVERY difference (elif hid the format entry)
            out.append({"kind": "format-changed", "field": name,
                        "detail": f"{of.format} -> {nf.format}",
                        "breaking": True})
        for key in of.constraints.keys() | nf.constraints.keys():
            ov = of.constraints.get(key)
            nv = nf.constraints.get(key)
            if ov == nv:
                continue
            if key not in nf.constraints:
                out.append({"kind": "constraint-removed", "field": name,
                            "detail": key, "breaking": False})
                continue
            if key not in of.constraints:
                # a fresh constraint restricts — EXCEPT an explicitly
                # falsy required/unique, which merely spells out the
                # default and cannot invalidate any row
                noop = key in ("required", "unique") and not bool(nv)
                out.append({"kind": "constraint-added", "field": name,
                            "detail": key, "breaking": not noop})
                continue
            t = tightened(key, ov, nv)
            out.append({
                "kind": "constraint-tightened" if t
                else ("constraint-loosened" if t is False
                      else "constraint-changed"),
                "field": name,
                "detail": f"{key}: {ov!r} -> {nv!r}",
                "breaking": t is not False,
            })

    if old.primary_key != new.primary_key:
        out.append({"kind": "primary-key-changed", "field": None,
                    "detail": f"{old.primary_key} -> {new.primary_key}",
                    "breaking": True})
    if old.unique_keys != new.unique_keys:
        out.append({"kind": "unique-keys-changed", "field": None,
                    "detail": f"{old.unique_keys} -> {new.unique_keys}",
                    "breaking": True})
    o_fk = [(fk.fields, fk.reference_resource, fk.reference_fields)
            for fk in old.foreign_keys]
    n_fk = [(fk.fields, fk.reference_resource, fk.reference_fields)
            for fk in new.foreign_keys]
    if o_fk != n_fk:
        out.append({"kind": "foreign-keys-changed", "field": None,
                    "detail": f"{o_fk} -> {n_fk}", "breaking": True})
    if old.missing_values != new.missing_values:
        out.append({"kind": "missing-values-changed", "field": None,
                    "detail": f"{old.missing_values} -> "
                              f"{new.missing_values}",
                    "breaking": True})
    return out
