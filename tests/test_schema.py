"""Schema model tests (M1 — no Spark needed)."""

from __future__ import annotations

import pytest

from goodtables_pandas_py_spark.patterns import strptime_to_spark
from goodtables_pandas_py_spark.schema import (
    Field,
    ForeignKey,
    Package,
    SchemaError,
    TableSchema,
)


def test_field_defaults():
    f = Field.from_descriptor({"name": "x"})
    assert f.type == "string" and f.format == "default"
    assert f.true_values == ["true", "True", "TRUE", "1"]


def test_field_number_options():
    f = Field.from_descriptor(
        {"name": "n", "type": "number", "decimalChar": ",", "groupChar": ".",
         "bareNumber": False}
    )
    assert f.decimal_char == "," and f.group_char == "." and not f.bare_number


def test_field_rejects_unknown_type():
    with pytest.raises(SchemaError):
        Field.from_descriptor({"name": "x", "type": "floaty"})


def test_field_rejects_unknown_constraint():
    with pytest.raises(SchemaError):
        Field.from_descriptor({"name": "x", "constraints": {"bogus": 1}})


def test_schema_keys_normalization():
    s = TableSchema.from_descriptor(
        {
            "fields": [{"name": "a"}, {"name": "b"}],
            "primaryKey": "a",
            "uniqueKeys": [["a", "b"], "b"],
            "foreignKeys": [
                {"fields": "a", "reference": {"resource": "", "fields": "b"}}
            ],
        }
    )
    assert s.primary_key == ["a"]
    assert s.unique_keys == [["a", "b"], ["b"]]
    assert s.foreign_keys[0] == ForeignKey(["a"], "", ["b"])


def test_schema_rejects_unknown_key_field():
    with pytest.raises(SchemaError):
        TableSchema.from_descriptor({"fields": [{"name": "a"}], "primaryKey": "zz"})


def test_package_duplicate_resources_rejected():
    with pytest.raises(SchemaError):
        Package.from_descriptor(
            {"resources": [{"name": "r", "path": "x.csv"}, {"name": "r", "path": "y.csv"}]}
        )


def test_strptime_translation():
    assert strptime_to_spark("%Y-%m-%d") == "yyyy-MM-dd"
    assert strptime_to_spark("%d/%m/%Y %H:%M") == "dd/MM/yyyy HH:mm"
    assert strptime_to_spark("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss"
    assert strptime_to_spark("%H%M%S") == "HHmmss"
    with pytest.raises(ValueError):
        strptime_to_spark("%Q")


def test_infer_schema_from_strings(spark):
    from goodtables_pandas_py_spark.inference import infer_schema

    rows = [
        ("1", "2.5", "true", "2024-01-02", "2024-01-02T10:00:00", "hello", ""),
        ("2", "3.25", "false", "2023-12-31", "2023-12-31T23:59:59", "world", "x"),
        ("3", "-1", "True", "2020-02-29", "2020-02-29T00:00:01", "!", "y"),
    ]
    df = spark.createDataFrame(
        rows, "i string, n string, b string, d string, dt string, s string, m string"
    )
    schema = infer_schema(df)
    types = {f.name: f.type for f in schema.fields}
    assert types == {
        "i": "integer",
        "n": "number",
        "b": "boolean",
        "d": "date",
        "dt": "datetime",
        "s": "string",
        "m": "string",
    }


def test_infer_schema_all_missing_column(spark):
    from goodtables_pandas_py_spark.inference import infer_schema

    df = spark.createDataFrame([("", "1")], "empty string, ok string")
    schema = infer_schema(df)
    types = {f.name: f.type for f in schema.fields}
    # all-missing column cannot be typed -> string fallback
    assert types == {"empty": "string", "ok": "integer"}


def test_infer_then_validate_roundtrip(spark):
    """Inferred schema must validate its own source cleanly."""
    from goodtables_pandas_py_spark.inference import infer_schema
    from goodtables_pandas_py_spark.validate import validate_table

    df = spark.createDataFrame(
        [("1", "a", "2024-01-01"), ("2", "b", "2024-06-30")],
        "id string, name string, day string",
    )
    schema = infer_schema(df)
    v = validate_table(df, schema, "t")
    assert v.valid, [e.to_dict() for e in v.errors]
    v.unpersist()


# --- descriptor profile validation (S1, SURVEY.md §1.4) -------------------


def test_profile_clean_descriptor():
    from goodtables_pandas_py_spark.profile import check_descriptor

    desc = {
        "resources": [
            {
                "name": "t",
                "path": "t.csv",
                "schema": {
                    "fields": [{"name": "a", "type": "integer"}],
                    "primaryKey": "a",
                    "foreignKeys": [
                        {
                            "fields": "a",
                            "reference": {"resource": "t", "fields": "a"},
                        }
                    ],
                },
            }
        ]
    }
    assert check_descriptor(desc) == []


def test_profile_violations_structured():
    from goodtables_pandas_py_spark.profile import check_descriptor

    # resources not a list -> datapackage-error
    errs = check_descriptor({"resources": {"name": "t"}})
    assert [e.code for e in errs] == ["datapackage-error"]
    assert "resources" in errs[0].message

    # missing resources entirely
    errs = check_descriptor({})
    assert errs and errs[0].code == "datapackage-error"

    # bad field type inside a schema subtree -> schema-error
    errs = check_descriptor(
        {
            "resources": [
                {
                    "name": "t",
                    "path": "t.csv",
                    "schema": {"fields": [{"name": "a", "type": "wat"}]},
                }
            ]
        }
    )
    assert [e.code for e in errs] == ["schema-error"]
    assert "'wat'" in errs[0].message

    # fields item missing required name; primaryKey wrong shape
    errs = check_descriptor(
        {
            "resources": [
                {
                    "name": "t",
                    "schema": {"fields": [{"type": "string"}], "primaryKey": 7},
                }
            ]
        }
    )
    codes = sorted(e.code for e in errs)
    assert codes == ["schema-error", "schema-error"]


def test_profile_bool_is_not_integer():
    from goodtables_pandas_py_spark.profile import _type_ok

    assert not _type_ok(True, "integer")
    assert _type_ok(3, "number")
    assert not _type_ok(True, "number")


# ---------------------------------------------------------------- schema_diff

def test_schema_diff_classifies_breaking_changes():
    from goodtables_pandas_py_spark.schema import (
        Field, ForeignKey, TableSchema, schema_diff,
    )

    old = TableSchema(
        fields=[
            Field("id", type="integer", constraints={"required": True}),
            Field("status", constraints={"enum": ["A", "B", "C"]}),
            Field("amt", type="number", constraints={"minimum": 0}),
            Field("note"),
        ],
        primary_key=["id"],
    )
    new = TableSchema(
        fields=[
            Field("id", type="integer", constraints={"required": True}),
            Field("status", constraints={"enum": ["A", "B"]}),       # narrowed
            Field("amt", type="number", constraints={"minimum": 10}),  # raised
            Field("note", constraints={"maxLength": 10}),             # added
            Field("extra"),                                           # added, optional
        ],
        primary_key=["id"],
        foreign_keys=[ForeignKey(["id"], "other", ["oid"])],
    )
    diff = {(d["kind"], d["field"]): d for d in schema_diff(old, new)}
    assert diff[("constraint-tightened", "status")]["breaking"]
    assert diff[("constraint-tightened", "amt")]["breaking"]
    assert diff[("constraint-added", "note")]["breaking"]
    assert diff[("field-added", "extra")]["breaking"] is False
    assert diff[("foreign-keys-changed", None)]["breaking"]
    assert len(diff) == 5


def test_schema_diff_loosening_is_compatible():
    from goodtables_pandas_py_spark.schema import Field, TableSchema, schema_diff

    old = TableSchema(fields=[
        Field("s", constraints={"enum": ["A"], "minLength": 5}),
        Field("n", type="number", constraints={"maximum": 10}),
    ])
    new = TableSchema(fields=[
        Field("s", constraints={"enum": ["A", "B"], "minLength": 2}),
        Field("n", type="number"),
    ])
    diff = schema_diff(old, new)
    assert diff and all(not d["breaking"] for d in diff), diff


def test_schema_diff_identical_is_empty():
    from goodtables_pandas_py_spark.schema import Field, TableSchema, schema_diff

    s = TableSchema(fields=[Field("a"), Field("b", type="integer")],
                    primary_key=["a"])
    assert schema_diff(s, s) == []


def test_schema_diff_falsy_added_and_combined_changes():
    from goodtables_pandas_py_spark.schema import Field, TableSchema, schema_diff

    old = TableSchema(fields=[Field("a", type="string", format="uuid")])
    new = TableSchema(fields=[
        Field("a", type="integer",
              constraints={"required": False}),
    ])
    diff = {d["kind"]: d for d in schema_diff(old, new)}
    # required: False spelled out = no new demand
    assert diff["constraint-added"]["breaking"] is False
    # type AND format both changed: both reported (elif hid format)
    assert "type-changed" in diff and "format-changed" in diff


def test_schema_descriptor_roundtrip():
    """to_descriptor is the exact inverse of from_descriptor, and the
    output is json-serializable — completes the infer-then-save loop
    (infer_schema -> to_descriptor -> datapackage.json)."""
    import json

    from goodtables_pandas_py_spark.schema import TableSchema

    desc = {
        "fields": [
            {"name": "id", "type": "integer",
             "constraints": {"required": True}},
            {"name": "email", "type": "string", "format": "email"},
            {"name": "amt", "type": "number", "decimalChar": ",",
             "groupChar": ".", "bareNumber": False},
            {"name": "ok", "type": "boolean", "trueValues": ["yes"],
             "falseValues": ["no"]},
            {"name": "note"},
        ],
        "missingValues": ["", "NA"],
        "primaryKey": ["id"],
        "uniqueKeys": [["email"]],
        "foreignKeys": [
            {"fields": ["id"],
             "reference": {"resource": "other", "fields": ["oid"]}},
        ],
    }
    s = TableSchema.from_descriptor(desc)
    out = s.to_descriptor()
    json.dumps(out)  # serializable
    assert TableSchema.from_descriptor(out) == s
    # defaults are omitted, not spelled out
    assert "missingValues" not in TableSchema(
        fields=s.fields
    ).to_descriptor()
    assert out["fields"][4] == {"name": "note"}


def test_infer_then_serialize(spark):
    """infer_schema's proposal serializes straight to a descriptor
    that parses back to the same schema."""
    from goodtables_pandas_py_spark.inference import infer_schema
    from goodtables_pandas_py_spark.schema import TableSchema

    df = spark.createDataFrame(
        [("1", "2024-01-02", "x")], "a: string, b: string, c: string"
    )
    s = infer_schema(df)
    assert TableSchema.from_descriptor(s.to_descriptor()) == s


def test_package_descriptor_roundtrip_and_revalidate(spark, tmp_path):
    """Package.to_descriptor closes the authoring loop: save a
    programmatically-built package as datapackage.json, reload it via
    the descriptor PATH, and validate — same report."""
    import json

    from goodtables_pandas_py_spark.schema import Package
    import goodtables_pandas_py_spark as gt

    csv = tmp_path / "t.csv"
    csv.write_text("id;status\n1;ok\n2;hm\n")
    desc = {
        "name": "authored",
        "resources": [{
            "name": "t",
            "path": str(csv),
            "dialect": {"delimiter": ";"},
            "schema": {
                "fields": [
                    {"name": "id", "type": "integer",
                     "constraints": {"required": True}},
                    {"name": "status", "type": "string",
                     "constraints": {"enum": ["ok"]}},
                ],
                "primaryKey": ["id"],
            },
        }],
    }
    pkg = Package.from_descriptor(desc)
    out = pkg.to_descriptor()
    json.dumps(out)
    assert Package.from_descriptor(out) == pkg
    # save -> validate from the saved FILE (S1 path semantics)
    path = tmp_path / "datapackage.json"
    path.write_text(json.dumps(out))
    rep = gt.validate(spark, str(path))
    assert rep["valid"] is False  # the 'hm' enum violation
    codes = {e["code"] for t in rep["tables"] for e in t["errors"]}
    assert codes == {"enumerable-constraint"}
