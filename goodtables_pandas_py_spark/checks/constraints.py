"""Field-constraint checks C1-C6 (SURVEY.md §2.4, [R check.py]).

Each constraint compiles to a boolean *violation mask* Column over the
parsed (typed) DataFrame. All masks for all fields are evaluated in ONE
wide aggregate pass (SURVEY.md §4.3.1) by ``validate`` — compiling here
never triggers a job.

Semantics notes (mirroring the reference / Table Schema spec):
- Unparseable values were nulled by the parser, so constraints other
  than ``required`` never double-report them (SURVEY.md §4.1).
- ``required`` fires on the post-missingValues lexical null, not on
  parse failures ([R check.py::check_constraints]).
- ``pattern`` applies to the lexical (pre-cast) string, fullmatch-
  anchored [SPEC table-schema §constraints-pattern].
- ``unique`` is not a row mask; it is handled with the key machinery
  (C2 ≡ single-field unique key, SURVEY.md §2.4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..parsers import parse_constraint_value
from ..schema import Field


def _const_lit(v, field: Field | None = None):
    """Constraint literal as a Column: tuple literals become struct
    literals whose FIELD NAMES AND TYPES match the parsed column
    (struct equality needs the same dataType — a name/type mismatch
    is a plan-time DATATYPE_MISMATCH, the r11 review finding):
    yearmonth → struct<year int, month int> (field-order
    lexicographic, so ordering works too), duration →
    struct<months long, seconds double>, geopoint →
    struct<lon double, lat double>. Everything else F.lit."""
    if isinstance(v, tuple):
        t = field.type if field is not None else "yearmonth"
        if t == "duration":
            return F.struct(
                F.lit(int(v[0])).cast("long").alias("months"),
                F.lit(float(v[1])).cast("double").alias("seconds"),
            )
        if t == "geopoint":
            return F.struct(
                F.lit(float(v[0])).cast("double").alias("lon"),
                F.lit(float(v[1])).cast("double").alias("lat"),
            )
        return F.struct(
            F.lit(int(v[0])).alias("year"), F.lit(int(v[1])).alias("month")
        )
    return F.lit(v)


#: constraint name -> goodtables data-quality-spec error code.
#: No 'unique' entry: C2 is a KEY check (single-field unique key via
#: checks/keys.py), never a row mask, so compile_constraints cannot
#: emit it — the entry only misled readers (r11 review).
CONSTRAINT_CODES = {
    "required": "required-constraint",
    "minLength": "minimum-length-constraint",
    "maxLength": "maximum-length-constraint",
    "minimum": "minimum-constraint",
    "maximum": "maximum-constraint",
    "enum": "enumerable-constraint",
    "pattern": "pattern-constraint",
}


@dataclass
class ConstraintCheck:
    """One compiled constraint: violation mask + reporting metadata."""

    field: str
    constraint: str
    code: str
    constraint_value: object
    mask: Column  # true where the row VIOLATES the constraint
    report_col: Column  # the value to sample for the error report


def _length_col(parsed: Column, field: Field) -> Column:
    # arrays/objects: element count [SPEC table-schema §constraints];
    # our object/array physical type is the JSON string, so measure via
    # parsed JSON length; strings measure characters.
    if field.type == "array":
        return F.json_array_length(parsed)
    if field.type == "object":
        return F.size(F.from_json(parsed, "map<string,string>"))
    return F.length(parsed)


def compile_constraints(
    field: Field, parsed: Column, raw: Column | None
) -> list[ConstraintCheck]:
    """Compile C1-C6 for one field. ``raw`` is the post-missingValues
    lexical column (None when validating an already-typed table — then
    ``required``/``pattern`` fall back to the parsed column)."""
    lex = raw if raw is not None else parsed
    out: list[ConstraintCheck] = []
    cons = field.constraints

    def add(name: str, value, mask: Column, report: Column) -> None:
        out.append(
            ConstraintCheck(
                field=field.name,
                constraint=name,
                code=CONSTRAINT_CODES[name],
                constraint_value=value,
                mask=F.coalesce(mask, F.lit(False)),
                report_col=report,
            )
        )

    if cons.get("required"):
        # C1: null after missing-values mapping
        add("required", True, lex.isNull(), lex)

    if "minLength" in cons:
        n = int(cons["minLength"])
        add("minLength", n, _length_col(parsed, field) < n, parsed)
    if "maxLength" in cons:
        n = int(cons["maxLength"])
        add("maxLength", n, _length_col(parsed, field) > n, parsed)

    if "minimum" in cons:
        v = parse_constraint_value(cons["minimum"], field)
        add("minimum", v, parsed < _const_lit(v, field), parsed)
    if "maximum" in cons:
        v = parse_constraint_value(cons["maximum"], field)
        add("maximum", v, parsed > _const_lit(v, field), parsed)

    if "enum" in cons:
        values = [parse_constraint_value(v, field) for v in cons["enum"]]
        # C5: literal IN-list; Catalyst turns long lists into a hash-set
        # probe. (Huge enum → broadcast-join variant lives in keys.py as
        # an FK against a literal parent.) Struct-typed literals
        # (yearmonth tuples) fold to an OR of equalities instead.
        if any(isinstance(v, tuple) for v in values):
            hit = None
            for v in values:
                eq = parsed == _const_lit(v, field)
                hit = eq if hit is None else (hit | eq)
            mask = parsed.isNotNull() & ~F.coalesce(hit, F.lit(False))
        else:
            mask = parsed.isNotNull() & ~parsed.isin(values)
        add("enum", values, mask, parsed)

    if "pattern" in cons:
        p = str(cons["pattern"])
        # fullmatch anchoring via non-capturing group [SPEC]
        add(
            "pattern",
            p,
            lex.isNotNull() & ~lex.rlike(f"^(?:{p})$"),
            lex,
        )

    return out
