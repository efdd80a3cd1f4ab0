"""Parser goldens P1-P21 (SURVEY.md §5.2.1): for each type×format a
matrix of (raw, must_parse) lexical cases from the Table Schema spec;
assert the bad-mask equals NOT must_parse."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from goodtables_pandas_py_spark.parsers import parse_field
from goodtables_pandas_py_spark.schema import Field


def run_cases(spark, field: Field, cases, missing=None):
    """cases: list of (raw, ok). Returns list of (raw, parsed, bad)."""
    df = spark.createDataFrame([(c[0],) for c in cases], "raw string")
    pf = parse_field(F.col("raw"), field, missing or [""])
    out = df.select(
        F.col("raw"), pf.parsed.alias("parsed"), pf.bad.alias("bad")
    ).collect()
    for (raw, ok), row in zip(cases, out):
        assert row["bad"] == (not ok), (
            f"{field.type}/{field.format} {raw!r}: expected "
            f"{'ok' if ok else 'error'}, got parsed={row['parsed']!r}"
        )
    return out


def test_string_default_never_errors(spark):
    run_cases(spark, Field("s"), [("anything", True), ("", True)])


def test_string_email(spark):
    f = Field("s", format="email")
    run_cases(
        spark,
        f,
        [
            ("a@b.co", True),
            ("john.doe+tag@sub.example.org", True),
            ("a@@b.co", False),
            ("no-at-sign", False),
            ("spaces in@x.co", False),
            ("a@tld-less", False),
        ],
    )


def test_string_uri(spark):
    f = Field("s", format="uri")
    run_cases(
        spark,
        f,
        [
            ("https://example.com/x?y=1", True),
            ("mailto:a@b.co", True),
            ("ftp://host/file", True),
            ("not a uri", False),
            ("//missing-scheme", False),
        ],
    )


def test_string_uuid(spark):
    f = Field("s", format="uuid")
    run_cases(
        spark,
        f,
        [
            ("123e4567-e89b-12d3-a456-426614174000", True),
            ("123E4567-E89B-12D3-A456-426614174000", True),
            ("123e4567e89b12d3a456426614174000", False),
            ("123e4567-e89b-12d3-a456-42661417400z", False),
        ],
    )


def test_string_binary(spark):
    f = Field("s", format="binary")
    run_cases(
        spark,
        f,
        [
            ("aGVsbG8=", True),
            ("aGVsbG9z", True),
            ("abc", False),  # length not multiple of 4
            ("a GVsbG8=", False),
        ],
    )


def test_number_default(spark):
    f = Field("n", type="number")
    run_cases(
        spark,
        f,
        [
            ("1", True),
            ("3.14", True),
            ("-0.5", True),
            ("+8", True),
            (".5", True),
            ("5.", True),
            ("1e5", True),
            ("2.5E-3", True),
            ("NaN", True),
            ("INF", True),
            ("-INF", True),
            ("nan", False),  # specials are case-sensitive per spec
            ("1.2.3", False),
            ("abc", False),
            ("1 000", False),  # no groupChar declared
            ("", True),  # missing value -> null, not an error
        ],
    )


def test_number_group_decimal_chars(spark):
    f = Field("n", type="number", decimal_char=",", group_char=".")
    run_cases(
        spark,
        f,
        [
            ("1.000,5", True),
            ("1000,5", True),
            ("1.000.000", True),
            # naive char replacement (reference semantics): ',' is the
            # decimal point, '.' stripped -> 1.0005
            ("1,000.5", True),
            ("1,2,3", False),
        ],
    )
    out = run_cases(spark, f, [("1.000,5", True)])
    assert out[0]["parsed"] == 1000.5


def test_number_bare_number_false(spark):
    f = Field("n", type="number", bare_number=False)
    out = run_cases(
        spark,
        f,
        [
            ("$1000", True),
            ("1000%", True),
            ("EUR 12.5 total", True),
            ("no digits", False),
        ],
    )
    assert out[0]["parsed"] == 1000.0
    assert out[2]["parsed"] == 12.5


def test_integer(spark):
    f = Field("i", type="integer")
    out = run_cases(
        spark,
        f,
        [
            ("0", True),
            ("007", True),
            ("-42", True),
            ("+42", True),
            ("1.0", False),
            ("1e3", False),
            ("abc", False),
            ("99999999999999999999999", False),  # int64 overflow
        ],
    )
    assert out[1]["parsed"] == 7


def test_boolean(spark):
    f = Field("b", type="boolean")
    run_cases(
        spark,
        f,
        [
            ("true", True),
            ("TRUE", True),
            ("1", True),
            ("false", True),
            ("0", True),
            ("yes", False),
            ("t", False),
        ],
    )


def test_boolean_custom_vocab(spark):
    f = Field("b", type="boolean", true_values=["yes"], false_values=["no"])
    out = run_cases(spark, f, [("yes", True), ("no", True), ("true", False)])
    assert out[0]["parsed"] is True and out[1]["parsed"] is False


def test_date_default_strict(spark):
    f = Field("d", type="date")
    out = run_cases(
        spark,
        f,
        [
            ("2024-01-02", True),
            ("2024-02-29", True),  # leap day
            ("2023-02-29", False),  # not a leap year
            ("2024-1-02", False),  # strict width
            ("2024-01-02T00:00:00", False),
            ("02/01/2024", False),
        ],
    )
    assert out[0]["parsed"] == dt.date(2024, 1, 2)


def test_date_pattern(spark):
    f = Field("d", type="date", format="%d/%m/%Y")
    out = run_cases(spark, f, [("02/01/2024", True), ("2024-01-02", False)])
    assert out[0]["parsed"] == dt.date(2024, 1, 2)


def test_date_any(spark):
    f = Field("d", type="date", format="any")
    out = run_cases(
        spark, f, [("2024-01-02", True), ("Jan 2, 2024", True), ("nope", False)]
    )
    assert out[1]["parsed"] == dt.date(2024, 1, 2)


def test_datetime_default(spark):
    f = Field("ts", type="datetime")
    out = run_cases(
        spark,
        f,
        [
            ("2024-01-02T03:04:05", True),
            ("2024-01-02T03:04:05.123456", True),
            ("2024-01-02T03:04:05Z", True),
            ("2024-01-02T08:34:05+05:30", True),
            ("2024-01-02 03:04:05", False),  # missing T
            ("2024-01-02", False),
            ("2024-01-02T25:00:00", False),
        ],
    )
    assert out[0]["parsed"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    # offset normalizes to UTC (session tz pinned to UTC)
    assert out[3]["parsed"] == dt.datetime(2024, 1, 2, 3, 4, 5)


def test_time(spark):
    f = Field("t", type="time")
    out = run_cases(
        spark,
        f,
        [
            ("00:00:00", True),
            ("23:59:59", True),
            ("23:59:60", False),  # leap second not representable
            ("24:00:00", False),
            ("9:00:00", False),  # strict width
            ("09:00", False),
        ],
    )
    assert out[1]["parsed"] == 23 * 3600 + 59 * 60 + 59


def test_year(spark):
    f = Field("y", type="year")
    out = run_cases(
        spark, f, [("2024", True), ("0042", True), ("-0500", True), ("24", False),
                   ("20240", False)]
    )
    assert out[0]["parsed"] == 2024


def test_yearmonth(spark):
    f = Field("ym", type="yearmonth")
    out = run_cases(
        spark,
        f,
        [("2024-01", True), ("2024-12", True), ("2024-13", False), ("2024-1", False),
         ("202401", False)],
    )
    assert out[0]["parsed"].asDict() == {"year": 2024, "month": 1}


def test_duration(spark):
    f = Field("du", type="duration")
    out = run_cases(
        spark,
        f,
        [
            ("P1Y2M3DT4H5M6S", True),
            ("P1Y", True),
            ("PT1H", True),
            ("P2W", True),
            ("PT0.5S", True),
            ("P", False),
            ("PT", False),
            ("1Y", False),
        ],
    )
    d = out[0]["parsed"].asDict()
    assert d["months"] == 14
    assert d["seconds"] == 3 * 86400 + 4 * 3600 + 5 * 60 + 6
    assert out[3]["parsed"].asDict()["seconds"] == 14 * 86400


def test_object(spark):
    f = Field("o", type="object")
    run_cases(
        spark,
        f,
        [
            ('{"a": 1}', True),
            ("{}", True),
            ('{"nested": {"b": [1,2]}}', True),
            ("[1,2]", False),  # top-level must be object
            ('{"broken": }', False),
            ("notjson", False),
        ],
    )


def test_array(spark):
    f = Field("a", type="array")
    run_cases(
        spark,
        f,
        [("[1,2]", True), ("[]", True), ('{"a":1}', False), ("[1,", False)],
    )


def test_geopoint_default(spark):
    f = Field("g", type="geopoint")
    out = run_cases(
        spark,
        f,
        [
            ("90,45", True),
            ("90, 45", True),
            ("-180.0, -90.0", True),
            ("181, 45", False),  # lon out of range
            ("90, 91", False),
            ("90", False),
            ("a,b", False),
        ],
    )
    assert out[0]["parsed"].asDict() == {"lon": 90.0, "lat": 45.0}


def test_geopoint_array(spark):
    f = Field("g", type="geopoint", format="array")
    out = run_cases(spark, f, [("[90, 45]", True), ("[181, 0]", False), ("[1]", False)])
    assert out[0]["parsed"].asDict() == {"lon": 90.0, "lat": 45.0}


def test_geopoint_object(spark):
    f = Field("g", type="geopoint", format="object")
    run_cases(
        spark,
        f,
        [('{"lon": 90, "lat": 45}', True), ('{"lon": 90}', False), ("[90,45]", False)],
    )


def test_geojson(spark):
    f = Field("g", type="geojson")
    run_cases(
        spark,
        f,
        [
            ('{"type": "Point", "coordinates": [0, 0]}', True),
            ('{"type": "FeatureCollection", "features": []}', True),
            ('{"type": "Nope"}', False),
            ('{"coordinates": [0,0]}', False),
            ("[]", False),
        ],
    )


def test_any_passthrough(spark):
    f = Field("x", type="any")
    run_cases(spark, f, [("whatever", True), ("123", True)])


def test_missing_values(spark):
    f = Field("i", type="integer")
    df = spark.createDataFrame([("",), ("NA",), ("5",), ("x",)], "raw string")
    pf = parse_field(F.col("raw"), f, ["", "NA"])
    rows = df.select(pf.parsed.alias("p"), pf.bad.alias("b")).collect()
    assert [r["p"] for r in rows] == [None, None, 5, None]
    assert [r["b"] for r in rows] == [False, False, False, True]


# --------------------------------------------- review-finding regressions

def test_yearmonth_min_max_constraints(spark):
    """minimum/maximum on yearmonth must compare as (year, month)
    structs, not crash on a string literal vs struct column."""
    from goodtables_pandas_py_spark.checks.constraints import compile_constraints
    from goodtables_pandas_py_spark.parsers import parse_field
    from goodtables_pandas_py_spark.schema import Field

    fld = Field("ym", type="yearmonth",
                constraints={"minimum": "2024-01", "maximum": "2024-06"})
    df = spark.createDataFrame(
        [("2023-12",), ("2024-03",), ("2024-07",)], "raw string"
    )
    pf = parse_field(F.col("raw"), fld, [""])
    checks = {c.constraint: c.mask
              for c in compile_constraints(fld, pf.parsed, F.col("raw"))}
    got = df.select(
        checks["minimum"].alias("lo"), checks["maximum"].alias("hi")
    ).collect()
    assert [(r["lo"], r["hi"]) for r in got] == [
        (True, False), (False, False), (False, True)]


def test_min_max_rejected_for_unorderable_types():
    from goodtables_pandas_py_spark.schema import Field, SchemaError

    # duration became min/max-orderable in r11 (struct<months,seconds>
    # orders field-wise; test_checks.test_duration_minimum_maximum) —
    # the unorderable examples are the genuinely partial types
    with pytest.raises(SchemaError, match="not.*supported for type"):
        Field("o", type="object", constraints={"minimum": "{}"})
    with pytest.raises(SchemaError, match="not.*supported for type"):
        Field("g", type="geopoint", constraints={"maximum": "1,1"})


def test_datetime_constraint_offset_normalizes_to_utc(spark):
    """An offset constraint literal must compare on the same UTC wall
    time the parsed column canonicalizes to."""
    from goodtables_pandas_py_spark.checks.constraints import compile_constraints
    from goodtables_pandas_py_spark.parsers import parse_field
    from goodtables_pandas_py_spark.schema import Field

    # minimum 12:00+05:00 == 07:00 UTC; data 08:00Z is ABOVE it
    fld = Field("ts", type="datetime",
                constraints={"minimum": "2024-01-01T12:00:00+05:00"})
    df = spark.createDataFrame([("2024-01-01T08:00:00Z",)], "raw string")
    pf = parse_field(F.col("raw"), fld, [""])
    checks = {c.constraint: c.mask
              for c in compile_constraints(fld, pf.parsed, F.col("raw"))}
    assert df.select(checks["minimum"].alias("m")).first()["m"] is False


def test_any_format_deterministic_and_utc(spark):
    """format='any': missing components anchor to 1970-01-01 (never
    the current date), and offsets canonicalize to UTC wall time."""
    from goodtables_pandas_py_spark.parsers import parse_field
    from goodtables_pandas_py_spark.schema import Field

    df = spark.createDataFrame(
        [("June 5",), ("2024-06-01T12:00:00+05:00",)], "raw string"
    )
    pf = parse_field(F.col("raw"), Field("d", type="datetime", format="any"), [""])
    vals = [r["p"] for r in df.select(pf.parsed.alias("p")).collect()]
    assert vals[0].year == 1970 and vals[0].month == 6 and vals[0].day == 5
    assert vals[1].hour == 7     # 12:00+05:00 == 07:00 UTC


def test_bare_number_honors_declared_group_char(spark):
    from goodtables_pandas_py_spark.parsers import parse_field
    from goodtables_pandas_py_spark.schema import Field

    fld = Field("v", type="number", bare_number=False, group_char="_")
    df = spark.createDataFrame([("1_500 EUR",)], "raw string")
    pf = parse_field(F.col("raw"), fld, [""])
    assert df.select(pf.parsed.alias("p")).first()["p"] == 1500.0


def test_object_enum_dict_literals_render_as_json(spark):
    from goodtables_pandas_py_spark.checks.constraints import compile_constraints
    from goodtables_pandas_py_spark.parsers import parse_field
    from goodtables_pandas_py_spark.schema import Field

    fld = Field("o", type="object", constraints={"enum": [{"a": 1}]})
    df = spark.createDataFrame([('{"a": 1}',), ('{"b": 2}',)], "raw string")
    pf = parse_field(F.col("raw"), fld, [""])
    checks = {c.constraint: c.mask
              for c in compile_constraints(fld, pf.parsed, F.col("raw"))}
    got = [r["m"] for r in df.select(checks["enum"].alias("m")).collect()]
    assert got == [False, True]   # exact lexical JSON match; no crash


def test_parse_time_seconds_of_day_is_timezone_independent(spark):
    """The default time path must not derive seconds-of-day from an
    epoch cast (correct only under UTC sessions)."""
    from goodtables_pandas_py_spark.parsers import parse_field
    from goodtables_pandas_py_spark.schema import Field

    df = spark.createDataFrame([("12:34:56",)], "raw string")
    pf = parse_field(F.col("raw"), Field("t", type="time"), [""])
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        v = df.select(pf.parsed.alias("p")).first()["p"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert v == 12 * 3600 + 34 * 60 + 56


def test_two_digit_year_pivots_like_strptime(spark):
    """%y: Python strptime maps 69-99 to 19xx; java.time 'yy' alone
    would give 20xx (silent century shift)."""
    from goodtables_pandas_py_spark.parsers import parse_field
    from goodtables_pandas_py_spark.schema import Field

    df = spark.createDataFrame(
        [("31/12/99",), ("01/01/68",), ("15/06/69",)], "raw string"
    )
    pf = parse_field(
        F.col("raw"), Field("d", type="date", format="%d/%m/%y"), [""]
    )
    years = [r["p"].year for r in df.select(pf.parsed.alias("p")).collect()]
    import datetime as dt

    want = [dt.datetime.strptime(v, "%d/%m/%y").year
            for v in ("31/12/99", "01/01/68", "15/06/69")]
    assert years == want == [1999, 2068, 1969]


def test_offset_pattern_accepts_colon_and_compact(spark):
    """%z: Python strptime accepts both '+02:30' and '+0230'; the
    translated pattern must too (the guard regex always did)."""
    from goodtables_pandas_py_spark.parsers import parse_field
    from goodtables_pandas_py_spark.schema import Field

    df = spark.createDataFrame(
        [("2024-01-01T00:00:00+02:30",), ("2024-01-01T00:00:00+0230",)],
        "raw string",
    )
    pf = parse_field(
        F.col("raw"),
        Field("t", type="datetime", format="%Y-%m-%dT%H:%M:%S%z"),
        [""],
    )
    vals = [r["p"] for r in df.select(pf.parsed.alias("p")).collect()]
    assert vals[0] == vals[1]           # same instant, both parse
    assert vals[0].hour == 21           # 00:00+02:30 == 21:30 UTC prev day
