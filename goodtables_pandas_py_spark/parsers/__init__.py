"""Vectorized type parsers P1-P21 (SURVEY.md §2.3).

Each parser mirrors one ``parse_<type>`` kernel of the public reference
([R parse.py]) but is expressed as Spark ``Column`` expressions so the
whole parse of a table compiles into ONE projection inside whole-stage
codegen — no Python in the hot path (the sole exception is the
``any``-format datetime family, P11, which wraps ``dateutil`` in a
pandas UDF exactly as the reference wraps it in Python).

Uniform shape (SURVEY.md §2.3 intro):

    parsed = expr(raw)                      # typed column, null if bad
    bad    = raw.isNotNull() & parsed.isNull()   # post-missingValues

``parse_field`` is the dispatcher ([R parse.py::parse_field], P22);
``ParsedField`` carries (parsed, bad) so ``parse_table`` (P23) can fuse
everything into a single select.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pandas as pd  # module scope: pandas-UDF type hints resolve here
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..patterns import (
    BASE64_RE,
    DURATION_RE,
    EMAIL_RE,
    GEOJSON_TYPES,
    INTEGER_RE,
    NUMBER_RE,
    TIME_RE,
    TOPOJSON_TYPES,
    URI_RE,
    UUID_RE,
    YEAR_RE,
    YEARMONTH_RE,
    strptime_to_spark,
    two_digit_year_correction,
)
from ..schema import Field

__all__ = ["ParsedField", "parse_field", "apply_missing_values", "parse_constraint_value"]


@dataclass
class ParsedField:
    """Parsed column + bad-value mask for one field."""

    name: str
    parsed: Column
    bad: Column  # true where lexical value exists but failed to parse


def apply_missing_values(col: Column, missing_values: list[str]) -> Column:
    """Map declared missing-value sentinels to null BEFORE parsing
    [SPEC table-schema §missing-values] (SURVEY.md §1.3). The default
    sentinel list is [""]."""
    if not missing_values:
        return col
    return F.when(col.isin(*missing_values), F.lit(None)).otherwise(col)


def _bad(raw: Column, parsed: Column) -> Column:
    return raw.isNotNull() & parsed.isNull()


# --- string family (P1-P5) ------------------------------------------------


def _parse_string(raw: Column, field: Field) -> ParsedField:
    fmt = field.format
    if fmt == "default":
        return ParsedField(field.name, raw, F.lit(False))
    if fmt == "email":
        ok = raw.rlike(EMAIL_RE)
    elif fmt == "uri":
        ok = raw.rlike(URI_RE)
    elif fmt == "uuid":
        ok = raw.rlike(UUID_RE)
    elif fmt == "binary":
        ok = raw.rlike(BASE64_RE) & (F.length(raw) % 4 == 0)
    else:  # pragma: no cover - schema validation rejects earlier
        raise ValueError(f"unknown string format {fmt!r}")
    parsed = F.when(ok, raw)  # value kept as string; invalid -> null
    return ParsedField(field.name, parsed, _bad(raw, parsed))


# --- numbers (P6, P7) -----------------------------------------------------


def _strip_bare_number(col: Column, field: Field | None = None) -> Column:
    """bareNumber=false: trim non-numeric prefix/suffix around the
    numeric token [SPEC table-schema §number]. The token's interior
    character class includes the field's DECLARED groupChar /
    decimalChar — a field with groupChar '_' must not have '1_500'
    truncated to '1' (silently wrong value)."""
    import re as _re

    extra = ""
    if field is not None:
        for ch in {field.group_char, field.decimal_char} - {"", "."}:
            extra += _re.escape(ch)
    token = F.regexp_extract(
        col,
        r"([+-]?(?:[0-9][0-9.,  '" + extra
        + r"]*)?[0-9](?:[eE][+-]?[0-9]+)?|[+-]?[0-9])",
        1,
    )
    return F.when(token == "", F.lit(None)).otherwise(token)


def _normalize_number(raw: Column, field: Field) -> Column:
    s = raw
    if not field.bare_number:
        s = _strip_bare_number(s, field)
    if field.group_char:
        s = F.replace(s, F.lit(field.group_char), F.lit(""))
    if field.decimal_char != ".":
        s = F.replace(s, F.lit(field.decimal_char), F.lit("."))
    return s


def _parse_number(raw: Column, field: Field) -> ParsedField:
    s = _normalize_number(raw, field)
    # specials NaN / INF / -INF are case-sensitive per spec
    parsed = (
        F.when(s == "NaN", F.lit(float("nan")))
        .when(s == "INF", F.lit(float("inf")))
        .when(s == "-INF", F.lit(float("-inf")))
        .when(s.rlike(NUMBER_RE), s.try_cast(T.DoubleType()))
    )
    return ParsedField(field.name, parsed, _bad(raw, parsed))


def _parse_integer(raw: Column, field: Field) -> ParsedField:
    s = raw if field.bare_number else _strip_bare_number(raw, field)
    # regex first rejects floats ('1.0'); try_cast catches int64 overflow
    parsed = F.when(s.rlike(INTEGER_RE), s.try_cast(T.LongType()))
    return ParsedField(field.name, parsed, _bad(raw, parsed))


# --- boolean (P8) ---------------------------------------------------------


def _parse_boolean(raw: Column, field: Field) -> ParsedField:
    parsed = (
        F.when(raw.isin(*field.true_values), F.lit(True))
        .when(raw.isin(*field.false_values), F.lit(False))
        .otherwise(F.lit(None).cast(T.BooleanType()))
    )
    return ParsedField(field.name, parsed, _bad(raw, parsed))


# --- temporal family (P9-P13) --------------------------------------------


def _pandas_any_datetime(raw: Column) -> Column:
    """P11: format='any' — dateutil permissive parse, the one place the
    reference's semantics genuinely need Python ([R parse.py::parse_date
    format=any]). Arrow-batched pandas UDF, never per-row Python."""

    @F.pandas_udf(T.TimestampNTZType())
    def any_dt(s: pd.Series) -> pd.Series:
        from dateutil import parser as du

        import datetime as dt

        # deterministic default: missing components (e.g. the year in
        # "June 5") must not come from the CURRENT date — the same
        # file would validate differently across runs/executors
        anchor = dt.datetime(1970, 1, 1)

        def one(v):
            if v is None:
                return None
            try:
                d = du.parse(v, default=anchor)
            except (ValueError, OverflowError):
                return None
            if d.tzinfo is not None:
                # same canonicalization as the explicit-format path:
                # offset inputs become UTC wall time, THEN drop tz
                d = d.astimezone(dt.timezone.utc)
            return d.replace(tzinfo=None)

        # parse each DISTINCT lexical once per batch (r11): dateutil
        # is the whole cost of this path and real columns repeat
        # values heavily (the bench's rendered order dates: ~60 rows
        # per distinct). one() is pure for a fixed anchor, so the
        # memo is exact; unseen values (incl. None) fall through to
        # NaT, which Arrow returns as NULL — same as one(None).
        lut = {v: one(v) for v in s.dropna().unique()}
        return s.map(lut)

    return any_dt(raw)


# NOTE on strictness (SURVEY.md §7.3.1): Spark's CORRECTED-mode
# java.time parser is already strptime-strict — 'yyyy-MM-dd' rejects
# '2024-1-01' (width) and '2023-02-29' (calendar validity), verified
# empirically against pyspark 4.1.2 — so no regex pre-guard is needed.
# Optional sections '[.SSSSSS][XXX]' accept variable-length fractions
# and Z / ±hh:mm offsets. Offsets convert to the session timezone; our
# entry points pin spark.sql.session.timeZone=UTC so the canonical
# TimestampNTZ wall time is UTC.

#: ISO 8601 datetime [SPEC table-schema §datetime]
ISO_DATETIME_FMT = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXX]"


def _parse_date(raw: Column, field: Field) -> ParsedField:
    fmt = field.format
    if fmt in ("default", ""):
        parsed = F.try_to_timestamp(raw, F.lit("yyyy-MM-dd")).cast(T.DateType())
    elif fmt == "any":
        parsed = _pandas_any_datetime(raw).cast(T.DateType())
    else:
        ts = F.try_to_timestamp(raw, F.lit(strptime_to_spark(fmt)))
        parsed = two_digit_year_correction(ts, fmt).cast(T.DateType())
    return ParsedField(field.name, parsed, _bad(raw, parsed))


def _parse_datetime(raw: Column, field: Field) -> ParsedField:
    fmt = field.format
    if fmt in ("default", ""):
        parsed = F.try_to_timestamp(raw, F.lit(ISO_DATETIME_FMT)).cast(
            T.TimestampNTZType()
        )
    elif fmt == "any":
        parsed = _pandas_any_datetime(raw)
    else:
        ts = F.try_to_timestamp(raw, F.lit(strptime_to_spark(fmt)))
        parsed = two_digit_year_correction(ts, fmt).cast(
            T.TimestampNTZType()
        )
    return ParsedField(field.name, parsed, _bad(raw, parsed))


def _parse_time(raw: Column, field: Field) -> ParsedField:
    """Canonical physical type: seconds-of-day IntegerType (SURVEY.md
    §1.3 — Spark has no TimeType before 4.1's TIME; int is join- and
    range-friendly)."""
    fmt = field.format
    if fmt in ("default", ""):
        ts = F.try_to_timestamp(
            F.concat(F.lit("1970-01-01 "), raw), F.lit("yyyy-MM-dd HH:mm:ss")
        )
        # hour/minute/second arithmetic, NOT ts.cast(long): the epoch
        # cast is only seconds-of-day when the session tz is UTC —
        # parse_field is public and must not depend on session tz
        parsed = F.when(
            raw.rlike(TIME_RE),
            F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts),
        ).cast(T.IntegerType())
    elif fmt == "any":
        ts = _pandas_any_datetime(raw)
        parsed = (F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)).cast(
            T.IntegerType()
        )
    else:
        ts = F.try_to_timestamp(raw, F.lit(strptime_to_spark(fmt)))
        parsed = (F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)).cast(
            T.IntegerType()
        )
    return ParsedField(field.name, parsed, _bad(raw, parsed))


# --- year / yearmonth (P16, P17) -----------------------------------------


def _parse_year(raw: Column, field: Field) -> ParsedField:
    parsed = F.when(raw.rlike(YEAR_RE), raw.try_cast(T.IntegerType()))
    return ParsedField(field.name, parsed, _bad(raw, parsed))


def _parse_yearmonth(raw: Column, field: Field) -> ParsedField:
    ok = raw.rlike(YEARMONTH_RE)
    parsed = F.when(
        ok,
        F.struct(
            F.substring(raw, 1, 4).try_cast(T.IntegerType()).alias("year"),
            F.substring(raw, 6, 2).try_cast(T.IntegerType()).alias("month"),
        ),
    )
    return ParsedField(field.name, parsed, _bad(raw, parsed))


# --- duration (P18) -------------------------------------------------------


def _parse_duration(raw: Column, field: Field) -> ParsedField:
    """ISO 8601 duration → struct<months:long, seconds:double>; no single
    Spark interval type holds both calendar and clock parts (SURVEY.md
    §1.3)."""
    ok = raw.rlike(DURATION_RE)
    num = lambda grp: F.coalesce(  # noqa: E731
        F.regexp_extract(raw, grp, 1).try_cast(T.DoubleType()), F.lit(0.0)
    )
    years = num(r"P[^T]*?([0-9]+)Y")
    months = num(r"P[^T]*?([0-9]+)M")
    weeks = num(r"P[^T]*?([0-9]+)W")
    days = num(r"P[^T]*?([0-9]+(?:\.[0-9]+)?)D")
    hours = num(r"T.*?([0-9]+)H")
    mins = num(r"T[0-9H]*?([0-9]+)M")
    secs = num(r"T.*?([0-9]+(?:\.[0-9]+)?)S")
    parsed = F.when(
        ok,
        F.struct(
            (years * 12 + months).cast(T.LongType()).alias("months"),
            (weeks * 7 * 86400 + days * 86400 + hours * 3600 + mins * 60 + secs).alias(
                "seconds"
            ),
        ),
    )
    return ParsedField(field.name, parsed, _bad(raw, parsed))


# --- object / array (P14, P15) -------------------------------------------


def _json_valid(raw: Column, leading: str) -> Column:
    """JSON validity with required top-level token. Spark 4's
    try_parse_json gives full-fidelity validation (SURVEY.md §2.3 P14);
    keep the lexical string as the parsed value (lossless)."""
    starts = F.ltrim(raw).startswith(leading)
    return starts & F.try_parse_json(raw).isNotNull()


def _parse_object(raw: Column, field: Field) -> ParsedField:
    parsed = F.when(_json_valid(raw, "{"), raw)
    return ParsedField(field.name, parsed, _bad(raw, parsed))


def _parse_array(raw: Column, field: Field) -> ParsedField:
    parsed = F.when(_json_valid(raw, "["), raw)
    return ParsedField(field.name, parsed, _bad(raw, parsed))


# --- geo (P19, P20) -------------------------------------------------------


def _lonlat(lon: Column, lat: Column) -> Column:
    ok = (
        lon.isNotNull()
        & lat.isNotNull()
        & (lon >= -180)
        & (lon <= 180)
        & (lat >= -90)
        & (lat <= 90)
    )
    return F.when(ok, F.struct(lon.alias("lon"), lat.alias("lat")))


def _parse_geopoint(raw: Column, field: Field) -> ParsedField:
    fmt = field.format
    if fmt in ("default", ""):
        # "lon, lat" (optional space) [SPEC table-schema §geopoint]
        parts = F.split(raw, r",")
        two = F.size(parts) == 2
        lon = F.when(two, F.trim(parts[0]).try_cast(T.DoubleType()))
        lat = F.when(two, F.trim(parts[1]).try_cast(T.DoubleType()))
        parsed = _lonlat(lon, lat)
    elif fmt == "array":
        arr = F.from_json(raw, T.ArrayType(T.DoubleType()))
        two = F.size(arr) == 2
        parsed = _lonlat(F.when(two, arr[0]), F.when(two, arr[1]))
    elif fmt == "object":
        st = F.from_json(
            raw,
            T.StructType(
                [
                    T.StructField("lon", T.DoubleType()),
                    T.StructField("lat", T.DoubleType()),
                ]
            ),
        )
        parsed = _lonlat(st["lon"], st["lat"])
    else:  # pragma: no cover
        raise ValueError(f"unknown geopoint format {fmt!r}")
    return ParsedField(field.name, parsed, _bad(raw, parsed))


def _parse_geojson(raw: Column, field: Field) -> ParsedField:
    types = TOPOJSON_TYPES if field.format == "topojson" else GEOJSON_TYPES
    ok = _json_valid(raw, "{") & F.get_json_object(raw, "$.type").isin(*types)
    parsed = F.when(ok, raw)
    return ParsedField(field.name, parsed, _bad(raw, parsed))


# --- any (P21) ------------------------------------------------------------


def _parse_any(raw: Column, field: Field) -> ParsedField:
    return ParsedField(field.name, raw, F.lit(False))


_PARSERS: dict[str, Callable[[Column, Field], ParsedField]] = {
    "string": _parse_string,
    "number": _parse_number,
    "integer": _parse_integer,
    "boolean": _parse_boolean,
    "date": _parse_date,
    "time": _parse_time,
    "datetime": _parse_datetime,
    "year": _parse_year,
    "yearmonth": _parse_yearmonth,
    "duration": _parse_duration,
    "object": _parse_object,
    "array": _parse_array,
    "geopoint": _parse_geopoint,
    "geojson": _parse_geojson,
    "any": _parse_any,
}


def parse_field(
    raw: Column, field: Field, missing_values: list[str] | None = None
) -> ParsedField:
    """P22 dispatcher ([R parse.py::parse_field]): missing-values mapping
    then the per-type kernel. ``raw`` must be a string column."""
    mv = missing_values if missing_values is not None else [""]
    raw_mv = apply_missing_values(raw, mv)
    return _PARSERS[field.type](raw_mv, field)


# --- typed-source fast path (r6) ------------------------------------------

_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def typed_fast_path(field: Field, src_t) -> Column | None:
    """The parsed Column for a TYPED source column whose render→parse
    roundtrip is a provable identity — or None when it is not.

    Columnar sources (parquet/ORC, user DataFrames) arrive typed; the
    all-string contract used to render every column lexically and
    re-parse it, which on a wide table is the bulk of the validation
    scan. When the source type already IS the parser's target, that
    roundtrip cannot change the value or fail, so the parse (and its
    bad mask) is skipped entirely. Eligibility is deliberately exact:

    - integer ← any integral type, widened to LONG (lossless; the
      parser's target), gated on bareNumber=true: with
      bareNumber=false the lexical path routes renditions through the
      strip regex, and equivalence is only provable token-by-token,
      so the fast path conservatively stands down (r7, ADVICE).
    - number ← DOUBLE only, gated on bareNumber=true AND group/
      decimalChar outside the rendition alphabet. FloatType is
      EXCLUDED: Spark renders float 0.1f as "0.1", which parses to
      double 0.1 ≠ cast(0.1f as double) — the fast path would diverge
      from the lexical path by one ULP-ish. Decimal is excluded for
      the same rendition-notation caution. bareNumber=false diverges
      on specials (a typed NaN renders to "NaN", which has no numeric
      token to strip — the lexical path flags it); a pathological
      groupChar of "." (or any rendition character) would rewrite
      "1.5" → "15" lexically while the fast path keeps 1.5 (r7,
      ADVICE).
    - boolean ← BOOLEAN, only when the field accepts the literal
      renditions "true"/"false" (custom true/falseValues that drop
      them would have flagged the rendition as a type error).
    - date/datetime ← DATE / TIMESTAMP(_NTZ), default format only;
      TimestampType casts to NTZ, which equals the
      render-in-session-tz → parse-to-NTZ composition in any session
      timezone.

    Everything else (string formats with validation, time, year,
    struct-producing types, or a source/target mismatch) returns None
    and takes the render→parse path, byte-identical to before."""
    c = F.col(field.name)
    t = field.type
    fmt = field.format or "default"
    if (
        t == "integer"
        and isinstance(src_t, _INTEGRAL_TYPES)
        and field.bare_number
    ):
        return c.cast(T.LongType())
    # every char a double rendition can contain ("-1.5E-10",
    # "NaN", "Infinity"): a group/decimalChar drawn from this set
    # would rewrite renditions lexically and break the identity
    _RENDITION_CHARS = set("0123456789.+-ENaInfity")
    if (
        t == "number"
        and isinstance(src_t, T.DoubleType)
        and field.bare_number
        and field.group_char not in _RENDITION_CHARS
        and field.decimal_char not in _RENDITION_CHARS - {"."}
    ):
        return c
    if (
        t == "boolean"
        and isinstance(src_t, T.BooleanType)
        and "true" in field.true_values
        and "false" in field.false_values
    ):
        return c
    if t == "date" and fmt == "default" and isinstance(src_t, T.DateType):
        return c
    if t == "datetime" and fmt == "default" and isinstance(
        src_t, (T.TimestampType, T.TimestampNTZType)
    ):
        return c.cast(T.TimestampNTZType())
    # string columns take the classic path (their "parse" is already
    # just missing-value mapping + optional format validation)
    return None


def missing_token_producible(src_t, token: str) -> bool:
    """Could ``token`` ever equal a non-null value's lexical
    rendition for this source type? If not (the default sentinel ""
    never is, for any non-string type), the fast path needs no
    rendition check at all; if yes (e.g. missingValues ["NaN"] on a
    double column), the fast path must null those renditions exactly
    like the lexical path did."""
    import re as _re

    if isinstance(src_t, T.StringType):
        return True  # a string value can equal any token
    if isinstance(src_t, _INTEGRAL_TYPES):
        return bool(_re.fullmatch(r"-?\d+", token))
    if isinstance(src_t, (T.FloatType, T.DoubleType)):
        try:
            float(token)  # accepts NaN / Infinity / 1.0E10 forms
            return True
        except ValueError:
            return False
    if isinstance(src_t, T.BooleanType):
        return token in ("true", "false")
    if isinstance(src_t, T.DateType):
        return bool(_re.fullmatch(r"\d{4}-\d{2}-\d{2}", token))
    if isinstance(src_t, (T.TimestampType, T.TimestampNTZType)):
        return bool(_re.match(r"\d{4}-\d{2}-\d{2}T", token))
    return True  # unknown type: be conservative, keep the check


# --- constraint-literal parsing (P22 second half) -------------------------


def parse_constraint_value(value, field: Field):
    """Parse enum/minimum/maximum constraint literals with the Python
    twin of the field's parser so comparisons are typed (SURVEY.md §2.3
    P22 — the reference routes constraint values through the same
    parser, [R parse.py::parse_field])."""
    import datetime as dt

    if value is None:
        return None
    t = field.type
    if t == "integer":
        return int(value)
    if t in ("number",):
        return float(value)
    if t == "year":
        return int(value)
    if t == "boolean":
        if isinstance(value, bool):
            return value
        if value in field.true_values:
            return True
        if value in field.false_values:
            return False
        raise ValueError(f"bad boolean constraint literal {value!r}")
    if t == "date":
        if isinstance(value, dt.date):
            return value
        return dt.date.fromisoformat(value)
    if t == "datetime":
        d = value if isinstance(value, dt.datetime) else (
            dt.datetime.fromisoformat(value.replace("Z", "+00:00"))
        )
        if d.tzinfo is not None:
            # same canonicalization as the parsed column: offset
            # literals become UTC wall time before dropping tz —
            # plain tz-strip compared the wrong instant
            d = d.astimezone(dt.timezone.utc)
        return d.replace(tzinfo=None)
    if t == "yearmonth":
        if isinstance(value, (list, tuple)) and len(value) == 2:
            return (int(value[0]), int(value[1]))
        import re as _re

        m = _re.fullmatch(r"(\d{4})-(\d{2})", str(value))
        if not m:
            raise ValueError(f"bad yearmonth constraint literal {value!r}")
        return (int(m.group(1)), int(m.group(2)))
    if t == "time":
        tm = dt.time.fromisoformat(value) if isinstance(value, str) else value
        return tm.hour * 3600 + tm.minute * 60 + tm.second
    if t == "duration":
        # Python twin of _parse_duration: ISO 8601 → (months, seconds)
        # tuple matching the parsed struct<months,seconds> — leaving
        # the literal a STRING made enum's isin a struct-vs-string
        # DATATYPE_MISMATCH that killed the whole plan (r11 review)
        import re as _re

        s = str(value)
        if not _re.match(DURATION_RE, s):  # pattern is ^...$-anchored
            raise ValueError(f"bad duration constraint literal {value!r}")

        def _num(pat: str) -> float:
            m = _re.search(pat, s)
            return float(m.group(1)) if m else 0.0

        months = int(
            _num(r"P[^T]*?([0-9]+)Y") * 12 + _num(r"P[^T]*?([0-9]+)M")
        )
        seconds = (
            _num(r"P[^T]*?([0-9]+)W") * 7 * 86400
            + _num(r"P[^T]*?([0-9]+(?:\.[0-9]+)?)D") * 86400
            + _num(r"T.*?([0-9]+)H") * 3600
            + _num(r"T[0-9H]*?([0-9]+)M") * 60
            + _num(r"T.*?([0-9]+(?:\.[0-9]+)?)S")
        )
        return (months, seconds)
    if t == "geopoint":
        # → (lon, lat) tuple matching struct<lon,lat>; accepts the
        # spec's three literal shapes
        if isinstance(value, dict):
            return (float(value["lon"]), float(value["lat"]))
        if isinstance(value, (list, tuple)) and len(value) == 2:
            return (float(value[0]), float(value[1]))
        parts = str(value).split(",")
        if len(parts) != 2:
            raise ValueError(f"bad geopoint constraint literal {value!r}")
        return (float(parts[0]), float(parts[1]))
    # JSON-typed fields keep their lexical string physical form:
    # render dict/list literals as JSON so the comparison literal is
    # a string (F.lit(dict) crashes), documented compare-lexical
    if isinstance(value, (dict, list)):
        import json as _json

        return _json.dumps(value)
    # string family and the rest compare lexically
    return value
